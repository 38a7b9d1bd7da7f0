"""Multimodal training CLI (rebuild of reference train_multimodal.py):
paired video+0D dataset -> {concat, TFN} x use_GB dispatch -> train /
train_DRW / train_GB(_dynamic) -> evaluate -> multimodal prob curve.

Usage:
    python -m kstar_tpu.cli.train_multimodal --model_type concat --synthetic
    python -m kstar_tpu.cli.train_multimodal --model_type TFN --use_GB --gb_dynamic
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    from .common import add_common_args

    p = argparse.ArgumentParser(description="train multimodal disruption predictor")
    p.add_argument("--model_type", type=str, default="concat", choices=["concat", "TFN"])
    p.add_argument("--use_GB", action="store_true")
    p.add_argument("--gb_dynamic", action="store_true")
    p.add_argument("--epoch_per_GB_estimate", type=int, default=16)
    p.add_argument("--n_epochs_GB_estimate", type=int, default=4)
    p.add_argument("--w_vis", type=float, default=0.1)
    p.add_argument("--w_0D", type=float, default=0.4)
    p.add_argument("--w_multi", type=float, default=0.5)
    p.add_argument("--tag", type=str, default=None)
    add_common_args(p, batch_size=32)
    p.add_argument("--tau", type=int, default=1)
    p.add_argument("--synthetic_dt", type=float, default=4.0 / 210.0,
                   help="ts-table period for --synthetic runs; the default "
                        "keeps smoke runs small, pass 1/210 (the reference's "
                        "5ms multimodal table period) for time-axis-correct "
                        "whole-shot sweeps/alarm artifacts")
    p.add_argument("--image_size", type=int, default=128)
    p.add_argument("--patch_size", type=int, default=16)
    p.add_argument("--dim", type=int, default=128)
    p.add_argument("--depth", type=int, default=2)
    p.add_argument("--n_heads", type=int, default=4)
    p.add_argument("--d_head", type=int, default=64)
    p.add_argument("--scale_dim", type=int, default=4)
    p.add_argument("--dropout", type=float, default=0.1)
    p.add_argument("--feature_dims", type=int, default=128)
    p.add_argument("--ts_layers", type=int, default=4)
    p.add_argument("--ts_heads", type=int, default=8)
    p.add_argument("--dim_feedforward", type=int, default=512)
    p.add_argument("--use_cca_pretrain", action="store_true")
    p.add_argument("--skip_extras", action="store_true")
    p.add_argument("--pair_mode", choices=("reference", "aligned"),
                   default="reference",
                   help="video<->0D window pairing after the t_disrupt filter. "
                        "'reference' reproduces the reference's shifted "
                        "re-pairing (src/dataset.py:639-652) exactly; "
                        "'aligned' drops filtered entries as pairs, keeping "
                        "the two modalities time-aligned (fixes the 0D "
                        "stream's flat-top false alarms — see "
                        "data/windows.py:multimodal_windows)")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ..config import DT_MULTI, AugmentConfig, Schema
    from ..data import (ImbalancedSampler, MultiModalDataset, Scaler,
                        random_split_shots)
    from ..data.device_pipe import DevicePreprocessor
    from ..eval.evaluate import evaluate_probs, format_report
    from ..models import TFN, MultiModalConcat, MultiModalGB, TFNGB
    from ..train import MetricWriter, create_train_state, fit
    from ..train.gb import fit_gb
    from ..viz import plot_learning_curve
    from .common import configs_from_args, load_data, make_tag

    train_cfg, loss_cfg, optim_cfg = configs_from_args(args)
    cols = Schema.INPUT_FEATURES
    test_shot = None if args.synthetic else args.test_shot_num

    dt = DT_MULTI if not args.synthetic else args.synthetic_dt

    disrupt_df, ts_df, store = load_data(args, need_video=True, dt=dt)
    from .common import partition_shots
    shots, normal_s, eval_disrupt_s, eval_normal_s = partition_shots(
        disrupt_df, sorted(store.arrays.keys()))
    # seeded random split (reference preparing_multi_data, utility.py:121-172)
    train_s, valid_s, test_s = random_split_shots(shots, test_shot, seed=42)
    from .common import resolve_normal_splits
    train_n, valid_n, test_n, sweep_normals, inc_normal = resolve_normal_splits(
        args, normal_s, lambda ss: random_split_shots(ss, None, seed=42))

    scaler = Scaler(args.scaler)
    df_train = ts_df[ts_df.shot.isin(list(train_s) + train_n)]
    scaler.fit(df_train[cols].values)

    mk = lambda ss: MultiModalDataset(store, ts_df, disrupt_df, cols, ss,
                                      seq_len=args.seq_len, dist=args.dist,
                                      dt=dt, tau=args.tau, scaler=scaler,
                                      pair_mode=args.pair_mode,
                                      include_normal=inc_normal)
    train_ds, valid_ds, test_ds = (mk(list(train_s) + train_n),
                                   mk(list(valid_s) + valid_n),
                                   mk(list(test_s) + test_n))
    print(f"datasets: train {len(train_ds)} valid {len(valid_ds)} test {len(test_ds)} "
          f"| class counts {train_ds.class_counts().tolist()}")

    dtype = jnp.bfloat16 if args.compute_dtype == "bfloat16" else jnp.float32
    crop = min(args.image_size, store.arrays[shots[0]].shape[1])
    vivit_kw = dict(image_size=crop, patch_size=args.patch_size, n_frames=args.seq_len,
                    dim=args.dim, depth=args.depth, n_heads=args.n_heads,
                    d_head=args.d_head, scale_dim=args.scale_dim,
                    dropout=args.dropout, embedd_dropout=args.dropout)
    ts_kw = dict(n_features=len(cols), feature_dims=args.feature_dims,
                 max_len=args.seq_len, n_layers=args.ts_layers,
                 n_heads=args.ts_heads, dim_feedforward=args.dim_feedforward,
                 dropout=args.dropout, cls_dims=128)

    if args.model_type == "concat":
        model = (MultiModalGB if args.use_GB else MultiModalConcat)(
            vivit_kwargs=vivit_kw, ts_kwargs=ts_kw, dtype=dtype)
    else:
        model = (TFNGB if args.use_GB else TFN)(
            vivit_kwargs=vivit_kw, ts_kwargs=ts_kw, dtype=dtype)

    put_train = DevicePreprocessor(crop, AugmentConfig(), train=True,
                                   out_dtype=dtype, seed=args.random_seed)
    put_eval = DevicePreprocessor(crop, AugmentConfig(), train=False, out_dtype=dtype)

    # crop/augment/normalize fuses INTO every train/eval/stream step (one
    # dispatch per step, like the vision CLI); the put hook only ships raw
    # uint8 bytes + the float 0D block. Streams that ignore video get its
    # preprocessing dead-code-eliminated from their graphs.
    from ..data.augment import make_pre_fns
    pre_train, pre_eval_fn = make_pre_fns(crop, AugmentConfig(), out_dtype=dtype)
    from .common import make_dp_mesh, make_raw_puts
    mesh = make_dp_mesh(args)
    put_raw, put_raw_stack = make_raw_puts(mesh)

    b0, _ = put_eval(train_ds.batch(np.arange(min(args.batch_size, len(train_ds)))))
    steps = max(len(train_ds) // args.batch_size, 1)
    state = create_train_state(model, None, jax.random.key(args.random_seed),
                               optim_cfg, steps_per_epoch=steps,
                               apply_args=(b0["video"], b0["0D"]))
    if mesh is not None:
        from ..parallel import replicate_state
        state = replicate_state(state, mesh)

    name = f"{args.model_type}{'_GB' if args.use_GB else ''}"
    tag = args.tag or make_tag(name, args, loss_cfg, train_cfg)
    if args.resume:
        from ..train import load_checkpoint
        last = os.path.join(args.weight_dir, f"{tag}_last.ckpt")
        if os.path.exists(last):
            state = load_checkpoint(state, last)
            print(f"resumed from {last} at step {int(state.step)}")
    writer = MetricWriter(os.path.join(args.save_dir, "tensorboard", tag))
    sampler = ImbalancedSampler(train_ds.labels) if args.use_sampling else None

    if args.use_cca_pretrain and not args.use_GB:
        from ..train.cca import train_cca
        state, cca_losses = train_cca(model, state, train_ds,
                                      batch_size=args.batch_size, n_epochs=4,
                                      put=put_train)
        print(f"CCA pretrain losses: {[round(l, 3) for l in cca_losses]}")

    if args.use_GB:
        gb0 = {"video": args.w_vis, "0D": args.w_0D, "multi": args.w_multi}
        state, hist, gb_w = fit_gb(model, state, train_ds, valid_ds, train_cfg,
                                   loss_cfg, tag=tag, gb_weights=gb0,
                                   dynamic=args.gb_dynamic,
                                   epoch_per_gb_estimate=args.epoch_per_GB_estimate,
                                   n_epochs_gb_estimate=args.n_epochs_GB_estimate,
                                   sampler=sampler, writer=writer, put=put_raw,
                                   put_stack=put_raw_stack,
                                   pre_fn=pre_train, pre_fn_eval=pre_eval_fn)
        print(f"final GB weights: {gb_w}")
        model_type = "multi-GB"
    else:
        state, hist = fit(model, state, train_ds, valid_ds, train_cfg, loss_cfg,
                          model_type="multi", tag=tag, sampler=sampler,
                          writer=writer, put=put_raw, put_eval=put_raw,
                          put_stack=put_raw_stack,
                          pre_fn=pre_train, pre_fn_eval=pre_eval_fn)
        model_type = "multi"

    plot_learning_curve(hist, os.path.join(args.save_dir, f"{tag}_learning_curve.png"))

    # test evaluation + extras run on the BEST checkpoint, not the final
    # epoch (reference train_multimodal.py:464 reloads best before eval)
    best_path = os.path.join(args.weight_dir, f"{tag}_best.ckpt")
    if os.path.exists(best_path):
        from ..train import load_checkpoint
        state = load_checkpoint(state, best_path)

    from ..losses import ldam_margins
    from ..train.loop import make_eval_step, run_eval_epoch

    eval_step = make_eval_step(model, loss_cfg, model_type)
    counts = test_ds.class_counts()
    w = jnp.ones(2); m = jnp.asarray(ldam_margins(counts, loss_cfg.ldam_max_m))
    gb = jnp.asarray([0.0, 0.0, 1.0])
    _, _, _, (probs, labels) = run_eval_epoch(
        eval_step, state, test_ds, args.batch_size, w, m, gb,
        put=put_eval, collect_probs=True)
    results = evaluate_probs(probs, labels, args.threshold)
    with open(os.path.join(args.save_dir, f"{tag}_report.txt"), "w") as f:
        f.write(format_report(results))
    print(f"test macro-F1 {results['macro_f1']:.4f} | ROC-AUC {results['roc_auc']:.4f}")

    if not args.skip_extras and test_s:
        from ..infer import predict_multimodal_shot
        from ..viz import plot_shot_probability

        # shot-level alarm scoring over the test shots (the vision CLI's
        # alarm artifacts, for the fusion path)
        curves = []
        try:
            from ..eval import sweep_multimodal_prob_curves
            from .common import write_alarm_artifacts

            # normal shots join the sweep as the false-alarm population;
            # under --train_with_normal only the HELD-OUT test normals
            curves = sweep_multimodal_prob_curves(
                model, state.params, state.batch_stats, store, ts_df,
                disrupt_df,
                list(test_s) + list(eval_disrupt_s) + list(sweep_normals)
                + list(eval_normal_s),
                cols, scaler,
                seq_len=args.seq_len,
                dist=args.dist, dt=dt, tau=args.tau, crop_size=crop,
                batch_size=args.batch_size, compute_dtype=dtype)
            write_alarm_artifacts(curves, args.threshold, args.save_dir, tag,
                                  min_dwell_s=args.alarm_dwell_s)
        except Exception as e:
            print(f"alarm evaluation skipped: {e}")

        shot = test_s[-1]
        row = disrupt_df[disrupt_df.shot == shot].iloc[0]
        d = ts_df[ts_df.shot == shot]
        # the alarm block already swept this shot — reuse its curve instead
        # of paying a second whole-shot device sweep
        held = [(tx, p) for s, _, tx, p in curves if s == int(shot)]
        if held:
            time_x, probs_c = held[0]
        else:
            time_x, probs_c = predict_multimodal_shot(
                model, state.params, state.batch_stats,
                np.asarray(store.arrays[shot]), d[cols].to_numpy(np.float32),
                d["time"].to_numpy(), scaler,
                int(row.frame_startup), int(row.frame_cutoff),
                float(row.tftsrt), float(row.tipminf),
                seq_len=args.seq_len, dist=args.dist, dt=dt, tau=args.tau,
                crop_size=crop, batch_size=args.batch_size, compute_dtype=dtype)
        if len(time_x):
            plot_shot_probability(d, time_x, probs_c, shot, float(row.tftsrt),
                                  float(row.tTQend), float(row.tipminf),
                                  save_path=os.path.join(args.save_dir, f"{tag}_prob_curve.png"))
        try:
            from ..viz import visualize_latent_space_multi
            visualize_latent_space_multi(
                model, state, test_ds, method="pca", put=put_eval,
                save_path=os.path.join(args.save_dir, f"{tag}_latent_multi.png"))
        except Exception as e:
            print(f"latent viz skipped: {e}")
    writer.close()
    return results


if __name__ == "__main__":
    main()
