"""Evaluation-only CLI (rebuild of reference evaluate_vision_network.py /
evaluate_0D_network.py): reload a checkpoint by tag and rerun evaluation,
per-shot detail dumps, and the continuous prob curve without training.

Usage:
    python -m kstar_tpu.cli.evaluate_model --kind 0D --model MLSTM_FCN --tag <tag> --synthetic
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    from .common import add_common_args

    p = argparse.ArgumentParser(description="evaluate a trained disruption predictor")
    p.add_argument("--kind", type=str, default="0D", choices=["0D", "vision", "multimodal"])
    p.add_argument("--model", type=str, default="Transformer")
    # multimodal reload args (mirror cli/train_multimodal.py)
    p.add_argument("--model_type", type=str, default="concat", choices=["concat", "TFN"])
    p.add_argument("--use_GB", action="store_true")
    p.add_argument("--tau", type=int, default=1)
    p.add_argument("--pair_mode", choices=("reference", "aligned"),
                   default="reference",
                   help="multimodal video<->0D pairing; pass the value used "
                        "at training time (see cli/train_multimodal.py)")
    p.add_argument("--ts_layers", type=int, default=4)
    p.add_argument("--ts_heads", type=int, default=8)
    p.add_argument("--tag", type=str, required=False, default=None)
    p.add_argument("--which", type=str, default="best", choices=["best", "last"])
    add_common_args(p, batch_size=128)
    # mirror the model-hparam args of the train CLIs so configs reconstruct
    p.add_argument("--feature_dims", type=int, default=128)
    p.add_argument("--n_layers", type=int, default=4)
    # None = per-kind default resolved in main(): the train CLIs disagree
    # (train_0d: n_heads 8 / ff 1024; train_vision: n_heads 4 / scale 8;
    # train_multimodal: n_heads 4 / scale 4 / ff 512) and a reload built
    # with the wrong one fails on checkpoint parameter shapes
    p.add_argument("--n_heads", type=int, default=None)
    p.add_argument("--dim_feedforward", type=int, default=None)
    p.add_argument("--cls_dims", type=int, default=128)
    p.add_argument("--conv_dim", type=int, default=64)
    p.add_argument("--conv_kernel", type=int, default=3)
    p.add_argument("--lstm_dim", type=int, default=128)
    p.add_argument("--lstm_layers", type=int, default=4)
    p.add_argument("--fcn_dim", type=int, default=128)
    p.add_argument("--reduction", type=int, default=16)
    p.add_argument("--dropout", type=float, default=0.1)
    p.add_argument("--image_size", type=int, default=128)
    p.add_argument("--patch_size", type=int, default=16)
    p.add_argument("--dim", type=int, default=128)
    p.add_argument("--depth", type=int, default=2)
    p.add_argument("--d_head", type=int, default=64)
    p.add_argument("--scale_dim", type=int, default=None)
    p.add_argument("--norm_dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"],
                   help="match the training run's ViViT LN/softmax dtype")
    p.add_argument("--alpha", type=float, default=0.01)
    p.add_argument("--bn_splits", type=int, default=None,
                   help="mirror of train_vision --bn_splits (SlowFast "
                        "SubBatchNorm); must match the trained checkpoint")
    p.add_argument("--synthetic_dt", type=float, default=4.0 / 210.0,
                   help="mirror of train_multimodal --synthetic_dt; must "
                        "match training or the window ladders shift")
    p.add_argument("--alarms", action="store_true",
                   help="(--kind vision) also sweep the test + normal shots "
                        "and regenerate the alarm artifacts "
                        "({tag}_alarms.json/csv, {tag}_threshold_tradeoff"
                        ".csv) from the reloaded checkpoint, no retraining")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    # per-kind model-hparam defaults, mirroring the matching train CLI so a
    # default-trained checkpoint reloads with default eval flags
    mm = args.kind == "multimodal"
    if args.n_heads is None:
        args.n_heads = 8 if args.kind == "0D" else 4
    if args.scale_dim is None:
        args.scale_dim = 4 if mm else 8
    if args.dim_feedforward is None:
        args.dim_feedforward = 512 if mm else 1024

    import jax
    import jax.numpy as jnp

    from ..config import DT_0D, Schema
    from ..data import TSDataset, prepare_0d_dataset
    from ..eval import evaluate, evaluate_detail
    from ..models import build_0d_model
    from ..train import create_train_state, load_checkpoint
    from .common import configs_from_args, load_data, make_tag

    train_cfg, loss_cfg, optim_cfg = configs_from_args(args)
    name = args.model
    if args.kind == "multimodal":
        # train_multimodal tags checkpoints by fusion type, not backbone name
        name = f"{args.model_type}{'_GB' if args.use_GB else ''}"
    tag = args.tag or make_tag(name, args, loss_cfg, train_cfg)
    ckpt = os.path.join(args.weight_dir, f"{tag}_{args.which}.ckpt")
    if not os.path.exists(ckpt):
        raise FileNotFoundError(f"checkpoint not found: {ckpt}")

    if args.kind == "0D":
        from .train_0d import model_config

        cols = Schema.INPUT_FEATURES
        test_shot = None if args.synthetic else args.test_shot_num
        disrupt_df, ts_df, _ = load_data(args, need_video=False, dt=DT_0D)
        df_train, df_valid, df_test, scaler = prepare_0d_dataset(
            ts_df, cols, scaler=args.scaler, test_shot=test_shot)
        mk = lambda df: TSDataset(df, disrupt_df, cols, seq_len=args.seq_len,
                                  dist=args.dist, dt=DT_0D, scaler=scaler)
        train_ds, valid_ds, test_ds = mk(df_train), mk(df_valid), mk(df_test)

        cfg = model_config(args, len(cols))
        dtype = jnp.bfloat16 if args.compute_dtype == "bfloat16" else jnp.float32
        model = build_0d_model(args.model, cfg, dtype=dtype)
        x0, _ = test_ds.batch(np.arange(min(8, len(test_ds))))
        state = create_train_state(model, jnp.asarray(x0), jax.random.key(0), optim_cfg)
        state = load_checkpoint(state, ckpt)

        results = evaluate(
            model, state, test_ds, loss_cfg, batch_size=args.batch_size,
            threshold=args.threshold,
            save_txt=os.path.join(args.save_dir, f"{tag}_eval_report.txt"),
            save_fig=os.path.join(args.save_dir, f"{tag}_eval.png"))
        print(f"test macro-F1 {results['macro_f1']:.4f} | ROC-AUC {results['roc_auc']:.4f}")

        evaluate_detail(model, state, {"train": train_ds, "valid": valid_ds,
                                       "test": test_ds}, loss_cfg,
                        batch_size=args.batch_size, threshold=args.threshold,
                        save_csv=os.path.join(args.save_dir, f"{tag}_detail.csv"))
        return results

    # --- multimodal ---------------------------------------------------------
    if args.kind == "multimodal":
        # Reload path for cli/train_multimodal.py checkpoints. Pass the SAME
        # model-hparam flags used at training time (unset flags resolve to
        # the multimodal trainer's defaults in main()).
        from ..config import DT_MULTI, AugmentConfig
        from ..data import MultiModalDataset, Scaler, random_split_shots
        from ..data.device_pipe import DevicePreprocessor
        from ..eval.evaluate import evaluate_probs, format_report
        from ..losses import ldam_margins
        from ..models import TFN, MultiModalConcat, MultiModalGB, TFNGB
        from ..train import create_train_state, load_checkpoint
        from ..train.loop import make_eval_step, run_eval_epoch
        from .common import load_data

        cols = Schema.INPUT_FEATURES
        test_shot = None if args.synthetic else args.test_shot_num
        dt = DT_MULTI if not args.synthetic else args.synthetic_dt
        disrupt_df, ts_df, store = load_data(args, need_video=True, dt=dt)
        shots = sorted(store.arrays.keys())
        # strip non-disruptive shots BEFORE splitting, exactly as the trainer
        # does — otherwise --synthetic_normal > 0 shifts the split and this
        # reload evaluates a different test population than training saw
        from .common import partition_shots, resolve_normal_splits
        shots, normal_s, eval_disrupt_s, eval_normal_s = partition_shots(
            disrupt_df, shots)
        train_s, valid_s, test_s = random_split_shots(shots, test_shot, seed=42)
        train_n, _, test_n, sweep_normals, inc_normal = resolve_normal_splits(
            args, normal_s, lambda ss: random_split_shots(ss, None, seed=42))

        scaler = Scaler(args.scaler)
        scaler.fit(ts_df[ts_df.shot.isin(list(train_s) + train_n)][cols].values)
        test_ds = MultiModalDataset(store, ts_df, disrupt_df, cols,
                                    list(test_s) + test_n,
                                    seq_len=args.seq_len, dist=args.dist,
                                    dt=dt, tau=args.tau, scaler=scaler,
                                    pair_mode=args.pair_mode,
                                    include_normal=inc_normal)

        dtype = jnp.bfloat16 if args.compute_dtype == "bfloat16" else jnp.float32
        crop = min(args.image_size, store.arrays[shots[0]].shape[1])
        vivit_kw = dict(image_size=crop, patch_size=args.patch_size,
                        n_frames=args.seq_len, dim=args.dim, depth=args.depth,
                        n_heads=args.n_heads, d_head=args.d_head,
                        scale_dim=args.scale_dim, dropout=args.dropout,
                        embedd_dropout=args.dropout)
        ts_kw = dict(n_features=len(cols), feature_dims=args.feature_dims,
                     max_len=args.seq_len, n_layers=args.ts_layers,
                     n_heads=args.ts_heads,
                     dim_feedforward=args.dim_feedforward,
                     dropout=args.dropout, cls_dims=128)
        if args.model_type == "concat":
            model = (MultiModalGB if args.use_GB else MultiModalConcat)(
                vivit_kwargs=vivit_kw, ts_kwargs=ts_kw, dtype=dtype)
        else:
            model = (TFNGB if args.use_GB else TFN)(
                vivit_kwargs=vivit_kw, ts_kwargs=ts_kw, dtype=dtype)

        put_eval = DevicePreprocessor(crop, AugmentConfig(), train=False,
                                      out_dtype=dtype)
        b0, _ = put_eval(test_ds.batch(np.arange(min(8, len(test_ds)))))
        state = create_train_state(model, None, jax.random.key(0), optim_cfg,
                                   apply_args=(b0["video"], b0["0D"]))
        state = load_checkpoint(state, ckpt)

        model_type = "multi-GB" if args.use_GB else "multi"
        eval_step = make_eval_step(model, loss_cfg, model_type)
        counts = test_ds.class_counts()
        w = jnp.ones(2)
        m = jnp.asarray(ldam_margins(counts, loss_cfg.ldam_max_m))
        gb = jnp.asarray([0.0, 0.0, 1.0])
        _, _, _, (probs, labels) = run_eval_epoch(
            eval_step, state, test_ds, args.batch_size, w, m, gb,
            put=put_eval, collect_probs=True)
        results = evaluate_probs(probs, labels, args.threshold)
        os.makedirs(args.save_dir, exist_ok=True)
        with open(os.path.join(args.save_dir, f"{tag}_eval_report.txt"), "w") as f:
            f.write(format_report(results))
        print(f"test macro-F1 {results['macro_f1']:.4f} | ROC-AUC {results['roc_auc']:.4f}")

        if args.alarms:
            from ..eval import sweep_multimodal_prob_curves
            from .common import write_alarm_artifacts

            curves = sweep_multimodal_prob_curves(
                model, state.params, state.batch_stats, store, ts_df,
                disrupt_df,
                list(test_s) + list(eval_disrupt_s) + list(sweep_normals)
                + list(eval_normal_s),
                cols, scaler,
                seq_len=args.seq_len, dist=args.dist, dt=dt, tau=args.tau,
                crop_size=crop, batch_size=args.batch_size,
                compute_dtype=dtype)
            write_alarm_artifacts(curves, args.threshold, args.save_dir, tag,
                                  min_dwell_s=args.alarm_dwell_s)
        return results

    # --- vision -------------------------------------------------------------
    import jax
    import jax.numpy as jnp

    from ..config import AugmentConfig
    from ..data import VideoDataset, split_shots
    from ..data.device_pipe import DevicePreprocessor
    from ..eval.evaluate import evaluate_probs, format_report
    from ..losses import ldam_margins
    from ..models import build_video_model
    from ..train import create_train_state, load_checkpoint
    from ..train.loop import make_eval_step, run_eval_epoch
    from .common import load_data
    from .train_vision import model_config as vision_model_config

    test_shot = None if args.synthetic else args.test_shot_num
    disrupt_df, ts_df, store = load_data(args, need_video=True)
    shots = sorted(store.arrays.keys())
    from .common import partition_shots, resolve_normal_splits
    # match train_vision's split exactly (eval-only carved off first)
    shots, normal_s, eval_disrupt_s, eval_normal_s = partition_shots(
        disrupt_df, shots)
    train_s, valid_s, test_s = split_shots(shots, test_shot)
    _, _, test_n, sweep_normals, inc_normal = resolve_normal_splits(
        args, normal_s, lambda ss: split_shots(ss, None))

    # reconstruct the vision config from the mirrored args
    ns = argparse.Namespace(**{**vars(args), "tau_alpha": 4, "tau_fast": 1,
                               "layer_sizes": [1, 2, 2, 1],
                               "bn_splits": getattr(args, "bn_splits", None),
                               "embedd_dropout": args.dropout})
    cfg, seq_len = vision_model_config(ns)
    dtype = jnp.bfloat16 if args.compute_dtype == "bfloat16" else jnp.float32
    model = build_video_model(args.model, cfg, dtype=dtype)

    crop = min(args.image_size, store.arrays[shots[0]].shape[1])
    put_eval = DevicePreprocessor(crop, AugmentConfig(), train=False, out_dtype=dtype)
    ds = VideoDataset(store, disrupt_df, list(test_s) + test_n,
                      seq_len=seq_len, dist=args.dist,
                      include_normal=inc_normal)
    x0, _ = put_eval(ds.batch(np.arange(min(8, len(ds)))))
    state = create_train_state(model, x0, jax.random.key(0), optim_cfg)
    state = load_checkpoint(state, ckpt)

    eval_step = make_eval_step(model, loss_cfg)
    counts = ds.class_counts()
    w = jnp.ones(2)
    m = jnp.asarray(ldam_margins(counts, loss_cfg.ldam_max_m))
    _, _, _, (probs, labels) = run_eval_epoch(
        eval_step, state, ds, args.batch_size, w, m, jnp.zeros(3),
        put=put_eval, collect_probs=True)
    results = evaluate_probs(probs, labels, args.threshold)
    os.makedirs(args.save_dir, exist_ok=True)
    with open(os.path.join(args.save_dir, f"{tag}_eval_report.txt"), "w") as f:
        f.write(format_report(results))
    print(f"test macro-F1 {results['macro_f1']:.4f} | ROC-AUC {results['roc_auc']:.4f}")

    if args.alarms:
        from .common import emit_alarm_artifacts

        emit_alarm_artifacts(
            model, state, store, disrupt_df,
            list(test_s) + list(eval_disrupt_s) + list(sweep_normals)
            + list(eval_normal_s),
            seq_len=seq_len, dist=args.dist, crop=crop,
            batch_size=args.batch_size, dtype=dtype,
            threshold=args.threshold, save_dir=args.save_dir, tag=tag,
            min_dwell_s=args.alarm_dwell_s)
    return results


if __name__ == "__main__":
    main()
