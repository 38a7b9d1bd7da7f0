"""0D network training CLI (rebuild of reference train_0D_network.py):
dataset build -> model dispatch -> train/train_DRW -> evaluate ->
feature importance -> latent viz -> continuous prob curve.

Usage:
    python -m kstar_tpu.cli.train_0d --model MLSTM_FCN --synthetic --num_epoch 4
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    from .common import add_common_args

    p = argparse.ArgumentParser(description="train 0D disruption predictor")
    p.add_argument("--model", type=str, default="Transformer",
                   choices=["Transformer", "CnnLSTM", "MLSTM_FCN"])
    p.add_argument("--tag", type=str, default=None)
    add_common_args(p, batch_size=256)
    # model hyperparameters (reference train_0D_network.py:117-136)
    p.add_argument("--alpha", type=float, default=0.01)
    p.add_argument("--dropout", type=float, default=0.1)
    p.add_argument("--feature_dims", type=int, default=128)
    p.add_argument("--n_layers", type=int, default=4)
    p.add_argument("--n_heads", type=int, default=8)
    p.add_argument("--dim_feedforward", type=int, default=1024)
    p.add_argument("--cls_dims", type=int, default=128)
    p.add_argument("--conv_dim", type=int, default=64)
    p.add_argument("--conv_kernel", type=int, default=3)
    p.add_argument("--lstm_dim", type=int, default=128)
    p.add_argument("--lstm_layers", type=int, default=4)
    p.add_argument("--fcn_dim", type=int, default=128)
    p.add_argument("--reduction", type=int, default=16)
    p.add_argument("--skip_extras", action="store_true",
                   help="skip feature importance / latent viz / prob curve")
    p.add_argument("--seeds", type=int, nargs="+", default=None,
                   help="train several seeds SIMULTANEOUSLY (vmap ensemble, "
                        "train/ensemble.py) — replaces the reference's "
                        "serial per-seed sweep processes (exp/*.sh seeds "
                        "40-43) at ~1x wall-clock for 0D models; per-seed "
                        "checkpoints + histories, then the best member "
                        "continues into eval/extras. With --dp the ensemble "
                        "axis shards over the data devices.")
    return p


def model_config(args, n_features: int):
    from ..config import CnnLSTMConfig, MLSTMFCNConfig, TransformerConfig

    if args.model == "Transformer":
        return TransformerConfig(
            n_features=n_features, feature_dims=args.feature_dims,
            max_len=args.seq_len, n_layers=args.n_layers, n_heads=args.n_heads,
            dim_feedforward=args.dim_feedforward, dropout=args.dropout,
            cls_dims=args.cls_dims)
    if args.model == "CnnLSTM":
        return CnnLSTMConfig(
            seq_len=args.seq_len, n_features=n_features, conv_dim=args.conv_dim,
            conv_kernel=args.conv_kernel, lstm_dim=args.lstm_dim,
            n_layers=args.lstm_layers)
    return MLSTMFCNConfig(
        n_features=n_features, fcn_dim=args.fcn_dim, seq_len=args.seq_len,
        lstm_dim=args.lstm_dim, lstm_dropout=args.dropout,
        reduction=args.reduction, alpha=args.alpha)


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.seeds and len(args.seeds) == 1:
        # a single --seeds value trains the normal path with that seed
        # (don't silently fall back to --random_seed)
        args.random_seed, args.seeds = args.seeds[0], None

    import jax
    import jax.numpy as jnp

    from ..config import DT_0D, Schema
    from ..data import ImbalancedSampler, TSDataset, prepare_0d_dataset
    from ..eval import evaluate, compute_permute_feature_importance
    from ..models import build_0d_model
    from ..train import MetricWriter, create_train_state, fit
    from ..viz import plot_learning_curve, visualize_latent_space
    from .common import configs_from_args, load_data, make_tag

    train_cfg, loss_cfg, optim_cfg = configs_from_args(args)
    cols = Schema.INPUT_FEATURES
    test_shot = None if args.synthetic else args.test_shot_num

    disrupt_df, ts_df, _ = load_data(args, need_video=False, dt=DT_0D)
    df_train, df_valid, df_test, scaler = prepare_0d_dataset(
        ts_df, cols, scaler=args.scaler, test_shot=test_shot)

    # --train_with_normal: non-disruptive shots already land in the splits
    # (prepare_0d_dataset partitions every shot in the table); the flag just
    # turns their zero-window walks into negative-only windows
    mk = lambda df: TSDataset(df, disrupt_df, cols, seq_len=args.seq_len,
                              dist=args.dist, dt=DT_0D, scaler=scaler,
                              include_normal=args.train_with_normal)
    train_ds, valid_ds, test_ds = mk(df_train), mk(df_valid), mk(df_test)
    print(f"datasets: train {len(train_ds)} valid {len(valid_ds)} test {len(test_ds)} "
          f"| class counts {train_ds.class_counts().tolist()}")

    cfg = model_config(args, len(cols))
    dtype = jnp.bfloat16 if args.compute_dtype == "bfloat16" else jnp.float32
    model = build_0d_model(args.model, cfg, dtype=dtype)

    x0, _ = train_ds.batch(np.arange(min(args.batch_size, len(train_ds))))
    steps = max(len(train_ds) // args.batch_size, 1)
    state = create_train_state(model, jnp.asarray(x0), jax.random.key(args.random_seed),
                               optim_cfg, steps_per_epoch=steps)

    tag = args.tag or make_tag(args.model, args, loss_cfg, train_cfg)
    writer = MetricWriter(os.path.join(args.save_dir, "tensorboard", tag))
    sampler = ImbalancedSampler(train_ds.labels) if args.use_sampling else None

    if args.resume:
        from ..train import load_checkpoint
        last = os.path.join(args.weight_dir, f"{tag}_last.ckpt")
        if os.path.exists(last):
            state = load_checkpoint(state, last)
            print(f"resumed from {last} at step {int(state.step)}")

    if args.seeds and len(args.seeds) > 1:
        from ..train import create_ensemble_state, fit_ensemble, unstack_ensemble
        mesh = None
        if args.dp and len(args.seeds) % args.dp == 0:
            # shard the ensemble axis over the data devices: each chip
            # trains its local members, no collectives
            from ..config import MeshConfig
            from ..parallel import make_mesh
            mesh = make_mesh(MeshConfig(data=args.dp, model=1),
                             jax.devices()[: args.dp])
        states = create_ensemble_state(model, jnp.asarray(x0), args.seeds,
                                       optim_cfg, steps_per_epoch=steps,
                                       mesh=mesh)
        # drop the tag's own _seed_N suffix: fit_ensemble appends _seed_{s}
        # per member, reproducing the reference's per-seed sweep tag scheme
        ens_tag = tag.rsplit("_seed_", 1)[0] if args.tag is None else tag
        states, hists = fit_ensemble(model, states, args.seeds, train_ds,
                                     valid_ds, train_cfg, loss_cfg, tag=ens_tag,
                                     sampler=sampler)
        for s, h in zip(args.seeds, hists):
            print(f"seed {s}: best valid f1 {h.best_f1:.4f} @ epoch {h.best_epoch + 1}")
        best_i = int(np.argmax([h.best_f1 for h in hists]))
        state, hist = unstack_ensemble(states, best_i), hists[best_i]
        print(f"continuing with best seed {args.seeds[best_i]}")
        best_path = os.path.join(
            args.weight_dir, f"{ens_tag}_seed_{args.seeds[best_i]}_best.ckpt")
    else:
        from .common import setup_dp
        state, mesh, put = setup_dp(args, state)
        put_stack = None
        if mesh is not None:
            from ..parallel import put_stack as _ps
            put_stack = lambda bl: (_ps(mesh, bl[0]), _ps(mesh, bl[1]))
        state, hist = fit(model, state, train_ds, valid_ds, train_cfg, loss_cfg,
                          tag=tag, sampler=sampler, writer=writer, put=put,
                          put_stack=put_stack)
        best_path = os.path.join(args.weight_dir, f"{tag}_best.ckpt")
    plot_learning_curve(hist, os.path.join(args.save_dir, f"{tag}_learning_curve.png"))

    # test evaluation + extras run on the BEST checkpoint, not the final
    # epoch (reference train_0D_network.py:393 reloads best before eval)
    if os.path.exists(best_path):
        from ..train import load_checkpoint
        state = load_checkpoint(state, best_path)

    results = evaluate(model, state, test_ds, loss_cfg,
                       batch_size=args.batch_size, threshold=args.threshold,
                       save_txt=os.path.join(args.save_dir, f"{tag}_report.txt"),
                       save_fig=os.path.join(args.save_dir, f"{tag}_eval.png"))
    print(f"test macro-F1 {results['macro_f1']:.4f} | ROC-AUC {results['roc_auc']:.4f}")

    if not args.skip_extras:
        fi = compute_permute_feature_importance(
            model, state, test_ds, loss_cfg, batch_size=args.batch_size,
            save_fig=os.path.join(args.save_dir, f"{tag}_feature_importance.png"))
        try:
            visualize_latent_space(model, state, test_ds, method="pca",
                                   save_path=os.path.join(args.save_dir, f"{tag}_latent_2d.png"))
        except Exception as e:
            print(f"latent viz skipped: {e}")

        # continuous prob curve on one held-out shot
        from ..infer import predict_0d_shot
        from ..viz import plot_shot_probability

        shot = int(disrupt_df.shot.values[-1])
        d = ts_df[ts_df.shot == shot]
        if len(d) > args.seq_len + args.dist + 1:
            row = disrupt_df[disrupt_df.shot == shot].iloc[0]
            time_x, probs = predict_0d_shot(
                model, state.params, state.batch_stats,
                d[cols].to_numpy(np.float32), d["time"].to_numpy(), scaler,
                seq_len=args.seq_len, dist=args.dist, dt=DT_0D)
            plot_shot_probability(d, time_x, probs, shot, float(row.tftsrt),
                                  float(row.tTQend), float(row.tipminf),
                                  save_path=os.path.join(args.save_dir, f"{tag}_prob_curve.png"))
    writer.close()
    return results


if __name__ == "__main__":
    main()
