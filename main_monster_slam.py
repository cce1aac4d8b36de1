#!/usr/bin/env python
"""MonST3R-SLAM (TPU): dynamic-scene pipeline entry point.

Mirrors the reference `main_monster_slam.py:152-361`: same CLI, MASt3R +
MonST3R dual-model inference (X/C from MonST3R, D/Q from MASt3R on shared
MonST3R encoder features), optical-flow-vs-ego-motion dynamic masking before
matching, and the same trajectory/PLY outputs. SAM2 refinement is an optional
plug-in (monst3r_slam_tpu.dynamic.mask.set_mask_refiner); flow defaults to
OpenCV DIS when no RAFT weights are available (see dynamic/mask.py docstring).
"""

from __future__ import annotations

import argparse
import pathlib
import time

import jax
import numpy as np
import yaml


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", required=True)
    parser.add_argument("--config", default="config/base.yaml")
    parser.add_argument("--save-as", dest="save_as", default="default")
    parser.add_argument("--no-viz", dest="no_viz", action="store_true")
    parser.add_argument("--calib", default="")
    parser.add_argument("--checkpoint", default="checkpoints/MASt3R_ViTLarge_BaseDecoder_512_catmlpdpt_metric.pth")
    parser.add_argument("--monst3r-checkpoint", default="checkpoints/MonST3R_PO-TA-S-W_ViTLarge_BaseDecoder_512_dpt.pth")
    parser.add_argument("--retrieval-checkpoint", default="")
    parser.add_argument(
        "--raft-checkpoint",
        default="checkpoints/Tartan-C-T-TSKH-spring540x960-M.pth",
        help="torch RAFT weights (reference tracker2.py:35-38); "
        "'random' installs the JAX RAFT with random init (for testing), "
        "missing file falls back to OpenCV DIS flow",
    )
    parser.add_argument(
        "--sam2-checkpoint",
        default="checkpoints/sam2_hiera_base_plus.pt",
        help="official SAM2 weights for mask refinement "
        "(reference monst3r_utils.py:640-703); 'random' installs the JAX "
        "SAM2 with random init (for testing), missing file keeps the "
        "native hysteresis+GrabCut refiner",
    )
    parser.add_argument("--max-frames", type=int, default=0)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    from monst3r_slam_tpu.app import evaluate
    from monst3r_slam_tpu.app.config import config, load_config
    from monst3r_slam_tpu.app.pipeline import SLAMSystem
    from monst3r_slam_tpu.data.datasets import Intrinsics, load_dataset
    from monst3r_slam_tpu.data.preprocess import resize_img
    from monst3r_slam_tpu.dynamic.inference import DualParams
    from monst3r_slam_tpu.models.config import MAST3R_512, MONST3R_512
    from monst3r_slam_tpu.slam import retrieval as retrieval_mod

    load_config(args.config)
    config.setdefault("use_dynamic_mask", True)

    dataset = load_dataset(args.dataset)
    dataset.subsample(config.get("dataset", {}).get("subsample", 1))

    if args.calib:
        with open(args.calib) as f:
            intr = yaml.safe_load(f)
        config["use_calib"] = True
        dataset.use_calibration = True
        dataset.camera_intrinsics = Intrinsics.from_calib(
            dataset.img_size,
            intr["width"], intr["height"],
            np.asarray([intr["fx"], intr["fy"], intr["cx"], intr["cy"]]
                       + list(intr.get("distortion", []))),
        )

    h_w, _ = dataset.get_img_shape()
    img_size = tuple(h_w)
    print(f"frame size: {img_size}, frames: {len(dataset)}")

    def load_or_random(path, default_cfg, seed):
        p = pathlib.Path(path)
        if p.is_file():
            from monst3r_slam_tpu.models.convert import load_checkpoint

            params, cfg = load_checkpoint(str(p))
            print(f"loaded checkpoint {p}")
            return params, cfg
        from monst3r_slam_tpu.models.init import init_params

        print(f"WARNING: checkpoint {p} not found — random weights")
        return init_params(jax.random.PRNGKey(seed), default_cfg), default_cfg

    mast3r_params, mast3r_cfg = load_or_random(args.checkpoint, MAST3R_512, args.seed)
    monst3r_params, monst3r_cfg = load_or_random(
        args.monst3r_checkpoint, MONST3R_512, args.seed + 1
    )
    if config.get("bf16_params", True):
        # bf16 weight storage: compute already runs bf16; halves weight HBM
        # traffic for both decode passes of the dual pipeline.
        from monst3r_slam_tpu.models.convert import cast_params_for_inference

        mast3r_params = cast_params_for_inference(mast3r_params)
        monst3r_params = cast_params_for_inference(monst3r_params)
    dual = DualParams(monst3r_params, monst3r_cfg, mast3r_params, mast3r_cfg)

    # Optical flow for the dynamic mask: JAX RAFT when weights are available
    # (reference loads RAFT at tracker2.py:35-38 and runs it at 20 iters inside
    # get_dynamic_mask, monst3r_utils.py:554); OpenCV DIS is the explicit
    # fallback when no checkpoint exists in this environment.
    from monst3r_slam_tpu.dynamic import mask as dyn_mask
    from monst3r_slam_tpu.dynamic import raft as raft_mod

    if args.raft_checkpoint == "random":
        raft_params = raft_mod.init_raft_params(jax.random.PRNGKey(args.seed + 2))
        dyn_mask.set_flow_estimator(raft_mod.make_raft_flow_estimator(raft_params))
        # fused single-dispatch RAFT+ego-flow+error-map program (the split
        # path pays a device round trip per stage)
        dyn_mask.set_flow_error_program(
            raft_mod.make_fused_flow_error_program(raft_params)
        )
        print("RAFT flow estimator installed (random init — testing only)")
    elif pathlib.Path(args.raft_checkpoint).is_file():
        raft_params = raft_mod.raft_params_from_torch(args.raft_checkpoint)
        dyn_mask.set_flow_estimator(raft_mod.make_raft_flow_estimator(raft_params))
        dyn_mask.set_flow_error_program(
            raft_mod.make_fused_flow_error_program(raft_params)
        )
        print(f"RAFT flow estimator installed from {args.raft_checkpoint}")
    else:
        print(
            f"RAFT checkpoint {args.raft_checkpoint} not found — "
            "falling back to OpenCV DIS optical flow"
        )

    # SAM2 refinement (reference monst3r_utils.py:640-703): real weights via
    # the converter when present; otherwise the native hysteresis+GrabCut
    # refiner stays the default behind the same config gate. With
    # `sam2_video_predictor: true` in the config, the full video-predictor
    # path (memory encoder + memory attention + object pointers,
    # dynamic/sam2_video.py) replaces the single-image decode — the exact
    # mechanism the reference drives via build_sam2_video_predictor.
    from monst3r_slam_tpu.dynamic import sam2 as sam2_mod

    use_video = bool(config.get("sam2_video_predictor", False))

    def _install_sam2(sam2_params, sam2_cfg, vparams=None, origin=""):
        if use_video:
            from monst3r_slam_tpu.dynamic import sam2_video as sam2v

            vcfg = (
                sam2v.VIDEO_TEST
                if sam2_cfg is sam2_mod.SAM2_TEST
                else sam2v.VIDEO_BASE_PLUS
            )
            if vparams is None:
                vparams = sam2v.init_video_params(
                    jax.random.PRNGKey(args.seed + 4), sam2_cfg, vcfg
                )
            dyn_mask.set_mask_refiner(
                sam2v.Sam2VideoRefiner(
                    sam2_params, vparams, sam2_cfg, vcfg,
                    carry_memory=bool(config.get("sam2_carry_memory", False)),
                )
            )
            print(f"SAM2 VIDEO-predictor refiner installed {origin}")
        else:
            dyn_mask.set_mask_refiner(sam2_mod.Sam2Refiner(sam2_params, sam2_cfg))
            print(f"SAM2 refiner installed {origin}")

    if args.sam2_checkpoint == "random":
        sam2_params = sam2_mod.init_sam2_params(
            jax.random.PRNGKey(args.seed + 3), sam2_mod.SAM2_TEST
        )
        _install_sam2(sam2_params, sam2_mod.SAM2_TEST,
                      origin="(random init — testing only)")
    elif pathlib.Path(args.sam2_checkpoint).is_file():
        if use_video:
            from monst3r_slam_tpu.dynamic import sam2_video as sam2v

            sam2_params, vparams = sam2v.video_params_from_torch(
                args.sam2_checkpoint
            )
            _install_sam2(sam2_params, sam2_mod.SAM2_BASE_PLUS, vparams,
                          origin=f"from {args.sam2_checkpoint}")
        else:
            sam2_params = sam2_mod.sam2_params_from_torch(args.sam2_checkpoint)
            _install_sam2(sam2_params, sam2_mod.SAM2_BASE_PLUS,
                          origin=f"from {args.sam2_checkpoint}")
    else:
        print(
            f"SAM2 checkpoint {args.sam2_checkpoint} not found — "
            "using the native hysteresis+GrabCut refiner"
        )

    K = None
    if config.get("use_calib", False) and dataset.has_calib():
        K = np.asarray(dataset.camera_intrinsics.K_frame, np.float32)

    retr_params = retrieval_mod.init_retrieval_params(
        jax.random.PRNGKey(1), monst3r_cfg.enc_dim
    )
    # No pretrained codebook by default: bootstrap one by k-means over the
    # first keyframes' own features (see ASMKDatabase docstring); codebook
    # policy (retrieval.n_words / bootstrap_frames) comes from the config.
    retr_db = retrieval_mod.ASMKDatabase.from_config(config)
    rp = pathlib.Path(args.retrieval_checkpoint) if args.retrieval_checkpoint else None
    if rp and rp.is_file():
        retr_params, _ = retrieval_mod.retrieval_params_from_checkpoint(str(rp))
        retr_db = retrieval_mod.ASMKDatabase(
            retrieval_mod.load_codebook(str(rp).replace(".pth", "_codebook.pkl"))
        )

    slam = SLAMSystem(
        params=mast3r_params,
        model_cfg=mast3r_cfg,
        cfg=dict(config),
        img_size=img_size,
        K=None if K is None else jax.numpy.asarray(K),
        retrieval_params=retr_params,
        retrieval_db=retr_db,
        dual=dual,
    )

    if not args.no_viz:
        from monst3r_slam_tpu.viz.live import LiveViewer

        viewer = LiveViewer()
        port = viewer.start()
        if port is not None:
            slam.viewer = viewer
            print(f"live viewer: http://127.0.0.1:{port}/ (disable with --no-viz)")


    n = len(dataset)
    if args.max_frames:
        n = min(n, args.max_frames)

    from monst3r_slam_tpu.data.prefetch import FramePrefetcher, uploading_preprocess

    # Decode+resize of frame t+1 overlaps the chip's work on frame t
    # (the reference preprocesses serially between device steps, main.py:247)
    frames = FramePrefetcher(
        dataset,
        uploading_preprocess(lambda img: resize_img(img, dataset.img_size)),
        hi=n,
    )
    t0 = time.time()
    for i, timestamp, out in frames:
        slam.process_frame(
            i, timestamp, out.get("img_dev", out["img"][0]),
            uimg=out["unnormalized_img"],
        )
        if slam.terminate_requested:  # viewer 'terminate' control (WindowMsg parity)
            print("terminated from viewer")
            frames.stop()
            break
        if i % 30 == 0 and i > 0:
            fps = i / (time.time() - t0)
            print(f"frame {i}/{n}  FPS: {fps:.3f}  keyframes: {int(slam.mem.count)}")

    slam.finalize()  # drain async backend work before export
    elapsed = time.time() - t0
    print(f"done: {n} frames in {elapsed:.1f}s = {n / elapsed:.3f} FPS "
          f"(backend stall {slam.backend_stall_s:.2f}s)")

    if dataset.save_results:
        save_dir, seq_name = evaluate.prepare_savedir(args, dataset)
        T_kfs, kf_ids = slam.keyframe_trajectory()
        evaluate.save_traj(save_dir, f"{seq_name}.txt", dataset.timestamps, T_kfs, kf_ids)
        frame_ids, T_all = slam.full_trajectory()
        ts_all = [dataset.timestamps[i] for i in frame_ids]
        evaluate.save_full_traj(save_dir, f"{seq_name}_full.txt", ts_all, T_all)
        n_kf = int(slam.mem.count)
        evaluate.save_reconstruction(
            save_dir, f"{seq_name}.ply",
            np.asarray(slam.mem.T_WC[:n_kf]),
            np.asarray(slam.mem.X_canon[:n_kf]),
            np.asarray(slam.mem.C[:n_kf] / np.maximum(np.asarray(slam.mem.N[:n_kf])[:, None, None], 1)),
            slam.keyframe_colors(),
            conf_threshold=1.5,
        )
        evaluate.save_keyframes(
            save_dir / "keyframes", dataset.timestamps, kf_ids,
            [np.asarray(u, np.float32) / 255.0 if u is not None
             else np.full((*img_size, 3), 0.5) for u in slam.kf_uimgs[:n_kf]],
        )
        print(f"saved results to {save_dir}")


if __name__ == "__main__":
    main()
