"""Vision network training CLI (rebuild of reference train_vision_network.py):
video dataset build -> ViViT/SlowFast/R2Plus1D dispatch -> train/train_DRW
-> evaluate -> latent viz -> continuous prob curve on the held-out shot.

Usage:
    python -m kstar_tpu.cli.train_vision --model ViViT --synthetic --num_epoch 2
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    from .common import add_common_args

    p = argparse.ArgumentParser(description="train vision disruption predictor")
    p.add_argument("--model", type=str, default="ViViT",
                   choices=["ViViT", "SlowFast", "R2Plus1D"])
    p.add_argument("--tag", type=str, default=None)
    p.add_argument("--seeds", type=int, nargs="+", default=None,
                   help="train several seeds SIMULTANEOUSLY (vmap ensemble, "
                        "train/ensemble.py; see cli/train_0d.py). Device "
                        "memory scales with len(seeds) per chip; with --dp "
                        "the ensemble axis shards over the data devices.")
    add_common_args(p, batch_size=64)
    p.add_argument("--image_size", type=int, default=128)
    # augmentation (reference train_vision_network.py:52-63)
    p.add_argument("--bright_val", type=int, default=10)
    p.add_argument("--bright_p", type=float, default=0.25)
    p.add_argument("--contrast_min", type=float, default=1.0)
    p.add_argument("--contrast_max", type=float, default=1.25)
    p.add_argument("--contrast_p", type=float, default=0.25)
    p.add_argument("--blur_k", type=int, default=5)
    p.add_argument("--blur_p", type=float, default=0.25)
    p.add_argument("--flip_p", type=float, default=0.25)
    p.add_argument("--vertical_ratio", type=float, default=0.1)
    p.add_argument("--vertical_p", type=float, default=0.25)
    p.add_argument("--horizontal_ratio", type=float, default=0.1)
    p.add_argument("--horizontal_p", type=float, default=0.25)
    # ViViT hyperparameters (reference :106-114)
    p.add_argument("--patch_size", type=int, default=16)
    p.add_argument("--alpha", type=float, default=1.0)
    p.add_argument("--dropout", type=float, default=0.1)
    p.add_argument("--embedd_dropout", type=float, default=0.1)
    p.add_argument("--dim", type=int, default=128)
    p.add_argument("--n_heads", type=int, default=4)
    p.add_argument("--d_head", type=int, default=64)
    p.add_argument("--scale_dim", type=int, default=8)
    p.add_argument("--depth", type=int, default=2)
    p.add_argument("--norm_dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"],
                   help="ViViT LN/softmax accumulation dtype (bfloat16: "
                        "+4.6%% step time, non-parity — PERFORMANCE.md)")
    # SlowFast (reference :117-118)
    p.add_argument("--tau_alpha", type=int, default=4)
    p.add_argument("--tau_fast", type=int, default=1)
    p.add_argument("--bn_splits", type=int, default=None,
                   help="SubBatchNorm split count for SlowFast multigrid "
                        "training (reference base_bn_splits; stats are "
                        "aggregated before every eval epoch)")
    # R2Plus1D
    p.add_argument("--layer_sizes", type=int, nargs=4, default=[1, 2, 2, 1])
    p.add_argument("--skip_extras", action="store_true")
    return p


def model_config(args):
    from ..config import R2Plus1DConfig, SlowFastConfig, ViViTConfig

    seq_len = args.seq_len
    if args.model == "SlowFast":
        # even-seq fixup (reference train_vision_network.py:153-155), rounded
        # to a multiple of alpha*tau_fast: the slow path subsamples every
        # alpha*tau_fast-th frame and its lateral concat needs matching time
        # dims, so rounding by alpha alone breaks any --tau_fast > 1
        step = args.tau_alpha * args.tau_fast
        if seq_len % step != 0:
            seq_len = max(seq_len - seq_len % step, step)
    if args.model == "ViViT":
        return ViViTConfig(
            image_size=args.image_size, patch_size=args.patch_size,
            n_frames=seq_len, dim=args.dim, depth=args.depth,
            n_heads=args.n_heads, d_head=args.d_head, scale_dim=args.scale_dim,
            dropout=args.dropout, embedd_dropout=args.embedd_dropout,
            norm_dtype=getattr(args, "norm_dtype", "float32")), seq_len
    if args.model == "SlowFast":
        return SlowFastConfig(image_size=args.image_size, n_frames=seq_len,
                              alpha=args.tau_alpha, tau_fast=args.tau_fast,
                              base_bn_splits=getattr(args, "bn_splits", None)), seq_len
    return R2Plus1DConfig(image_size=args.image_size, n_frames=seq_len,
                          layer_sizes=tuple(args.layer_sizes), alpha=0.01), seq_len


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.seeds and len(args.seeds) == 1:
        # a single --seeds value trains the normal path with that seed
        # (don't silently fall back to --random_seed)
        args.random_seed, args.seeds = args.seeds[0], None

    import jax
    import jax.numpy as jnp

    from ..config import AugmentConfig, Schema
    from ..data import ImbalancedSampler, VideoDataset, split_shots
    from ..data.device_pipe import DevicePreprocessor
    from ..eval import evaluate
    from ..models import build_video_model
    from ..train import MetricWriter, create_train_state, fit
    from ..viz import plot_learning_curve
    from .common import configs_from_args, load_data, make_tag

    train_cfg, loss_cfg, optim_cfg = configs_from_args(args)
    test_shot = None if args.synthetic else args.test_shot_num

    disrupt_df, ts_df, store = load_data(args, need_video=True)
    from .common import partition_shots
    shots, normal_s, eval_disrupt_s, eval_normal_s = partition_shots(
        disrupt_df, sorted(store.arrays.keys()))
    train_s, valid_s, test_s = split_shots(shots, test_shot)
    from .common import resolve_normal_splits
    train_n, valid_n, test_n, sweep_normals, inc_normal = resolve_normal_splits(
        args, normal_s, lambda ss: split_shots(ss, None))

    cfg, seq_len = model_config(args)
    mk = lambda ss: VideoDataset(store, disrupt_df, ss, seq_len=seq_len,
                                 dist=args.dist, include_normal=inc_normal)
    train_ds, valid_ds, test_ds = (mk(list(train_s) + train_n),
                                   mk(list(valid_s) + valid_n),
                                   mk(list(test_s) + test_n))
    print(f"datasets: train {len(train_ds)} valid {len(valid_ds)} test {len(test_ds)} "
          f"| class counts {train_ds.class_counts().tolist()}")

    dtype = jnp.bfloat16 if args.compute_dtype == "bfloat16" else jnp.float32
    model = build_video_model(args.model, cfg, dtype=dtype)

    aug = AugmentConfig(
        bright_val=args.bright_val, bright_p=args.bright_p,
        contrast_min=args.contrast_min, contrast_max=args.contrast_max,
        contrast_p=args.contrast_p, blur_k=args.blur_k, blur_p=args.blur_p,
        flip_p=args.flip_p, vertical_ratio=args.vertical_ratio,
        vertical_p=args.vertical_p, horizontal_ratio=args.horizontal_ratio,
        horizontal_p=args.horizontal_p)

    crop = min(args.image_size, store.arrays[shots[0]].shape[1])
    from .common import make_dp_mesh, make_raw_puts
    mesh = make_dp_mesh(args)

    # preprocessing (crop/augment/normalize) fuses INTO the train/eval step
    # (one dispatch per step); the put hook only ships raw uint8 bytes
    from ..data.augment import make_pre_fns
    pre_train, pre_eval_fn = make_pre_fns(crop, aug, out_dtype=dtype)

    put_raw, put_raw_stack = make_raw_puts(mesh)

    # device-side preprocessor retained for state init / standalone eval
    put_eval = DevicePreprocessor(crop, aug, train=False, out_dtype=dtype, mesh=mesh)

    x0, _ = put_eval(train_ds.batch(np.arange(min(args.batch_size, len(train_ds)))))
    steps = max(len(train_ds) // args.batch_size, 1)
    state = create_train_state(model, x0, jax.random.key(args.random_seed),
                               optim_cfg, steps_per_epoch=steps)
    if mesh is not None:
        from ..parallel import replicate_state
        state = replicate_state(state, mesh)

    tag = args.tag or make_tag(args.model, args, loss_cfg, train_cfg)
    if args.resume:
        from ..train import load_checkpoint
        last = os.path.join(args.weight_dir, f"{tag}_last.ckpt")
        if os.path.exists(last):
            state = load_checkpoint(state, last)
            print(f"resumed from {last} at step {int(state.step)}")
    writer = MetricWriter(os.path.join(args.save_dir, "tensorboard", tag))
    sampler = ImbalancedSampler(train_ds.labels) if args.use_sampling else None

    if args.seeds and len(args.seeds) > 1:
        if getattr(args, "bn_splits", None):
            raise SystemExit("--bn_splits is not supported with the vmapped "
                             "--seeds ensemble (stat aggregation is wired into "
                             "the single-model fit driver)")
        # vmapped multi-seed ensemble (train/ensemble.py). Device memory
        # scales with len(seeds) per chip: fine for ViViT-class models at
        # B<=64, size R2Plus1D runs accordingly. With --dp the ensemble
        # axis shards over the data devices (each chip trains its local
        # members, no collectives).
        from ..train import create_ensemble_state, fit_ensemble, unstack_ensemble
        ens_mesh = (mesh if mesh is not None
                    and len(args.seeds) % mesh.shape["data"] == 0 else None)
        steps = max(len(train_ds) // args.batch_size, 1)
        states = create_ensemble_state(model, x0, args.seeds, optim_cfg,
                                       steps_per_epoch=steps, mesh=ens_mesh)
        ens_tag = tag.rsplit("_seed_", 1)[0] if args.tag is None else tag
        # batches REPLICATE across members (every member sees the full
        # batch): with the ensemble axis sharded, a data-sharded put would
        # force a per-step all-gather, so ship batches unsharded
        ens_put = (put_raw if ens_mesh is None else
                   (lambda bl: (jnp.asarray(bl[0]), jnp.asarray(bl[1]))))
        states, hists = fit_ensemble(model, states, args.seeds, train_ds,
                                     valid_ds, train_cfg, loss_cfg, tag=ens_tag,
                                     sampler=sampler, put=ens_put,
                                     pre_fn=pre_train, pre_fn_eval=pre_eval_fn)
        for s, h in zip(args.seeds, hists):
            print(f"seed {s}: best valid f1 {h.best_f1:.4f} @ epoch {h.best_epoch + 1}")
        best_i = int(np.argmax([h.best_f1 for h in hists]))
        state, hist = unstack_ensemble(states, best_i), hists[best_i]
        print(f"continuing with best seed {args.seeds[best_i]}")
        best_path = os.path.join(
            args.weight_dir, f"{ens_tag}_seed_{args.seeds[best_i]}_best.ckpt")
    else:
        eval_stats_fn = None
        if getattr(args, "bn_splits", None):
            if args.batch_size % args.bn_splits:
                raise SystemExit(f"--batch_size {args.batch_size} must be "
                                 f"divisible by --bn_splits {args.bn_splits}")
            from ..models import aggregate_batch_stats
            eval_stats_fn = aggregate_batch_stats
        state, hist = fit(model, state, train_ds, valid_ds, train_cfg, loss_cfg,
                          tag=tag, sampler=sampler, writer=writer,
                          put=put_raw, put_eval=put_raw, put_stack=put_raw_stack,
                          pre_fn=pre_train, pre_fn_eval=pre_eval_fn,
                          eval_stats_fn=eval_stats_fn)
        best_path = os.path.join(args.weight_dir, f"{tag}_best.ckpt")
    plot_learning_curve(hist, os.path.join(args.save_dir, f"{tag}_learning_curve.png"))

    # test evaluation + extras run on the BEST checkpoint, not the final
    # epoch (reference train_vision_network.py:393 reloads best before eval)
    if os.path.exists(best_path):
        from ..train import load_checkpoint
        state = load_checkpoint(state, best_path)

    # evaluate: eval-mode preprocessing
    from ..train.loop import make_eval_step, run_eval_epoch
    from ..eval.evaluate import evaluate_probs, format_report

    eval_step = make_eval_step(model, loss_cfg)
    counts = test_ds.class_counts()
    from ..losses import ldam_margins
    w = jnp.ones(2); m = jnp.asarray(ldam_margins(counts, loss_cfg.ldam_max_m)); gb = jnp.zeros(3)
    _, _, _, (probs, labels) = run_eval_epoch(
        eval_step, state, test_ds, args.batch_size, w, m, gb,
        put=put_eval, collect_probs=True)
    results = evaluate_probs(probs, labels, args.threshold)
    with open(os.path.join(args.save_dir, f"{tag}_report.txt"), "w") as f:
        f.write(format_report(results))
    print(f"test macro-F1 {results['macro_f1']:.4f} | ROC-AUC {results['roc_auc']:.4f}")

    if not args.skip_extras:
        # shot-level alarm scoring over the test shots
        curves = []
        try:
            from .common import emit_alarm_artifacts

            # normal (non-disruptive) shots join the sweep as the
            # false-alarm population (round-3 verdict #4); under
            # --train_with_normal only the HELD-OUT test normals are swept
            curves = emit_alarm_artifacts(
                model, state, store, disrupt_df,
                list(test_s) + list(eval_disrupt_s) + list(sweep_normals)
                + list(eval_normal_s),
                seq_len=seq_len,
                dist=args.dist, crop=crop, batch_size=args.batch_size,
                dtype=dtype, threshold=args.threshold,
                save_dir=args.save_dir, tag=tag,
                min_dwell_s=args.alarm_dwell_s)
        except Exception as e:
            print(f"alarm evaluation skipped: {e}")

        from ..infer import predict_video_shot
        from ..viz import plot_shot_probability_zoom

        shot = test_s[-1] if test_s else shots[-1]
        row = disrupt_df[disrupt_df.shot == shot].iloc[0]
        # the alarm block already swept this shot (sweep_prob_curves pads/
        # suppresses identically to predict_video_shot) — reuse its curve
        # instead of paying a second whole-shot device sweep
        held = [(tx, p) for s, _, tx, p in curves if s == int(shot)]
        if held:
            time_x, probs_c = held[0]
        else:
            frames = np.asarray(store.arrays[shot])
            time_x, probs_c = predict_video_shot(
                model, state.params, state.batch_stats, frames,
                int(row.frame_startup), int(row.frame_cutoff),
                seq_len=seq_len, dist=args.dist, crop_size=crop,
                batch_size=args.batch_size, compute_dtype=dtype)
        plot_shot_probability_zoom(
            time_x, probs_c, shot, float(row.tftsrt), float(row.tTQend),
            float(row.tipminf), args.dist / 210.0,
            save_path=os.path.join(args.save_dir, f"{tag}_prob_curve.png"))
    writer.close()
    return results


if __name__ == "__main__":
    main()
