#!/usr/bin/env python
"""Easi3R-SLAM (TPU): attention-reweighted dynamic-scene pipeline.

Mirrors the reference `main_easier_slam.py` + `tracker3.py:15` +
`easi3r_utils.py:53-150` (the reference's Easi3R submodule is empty in the
snapshot; the mechanism is reimplemented natively in dynamic/easi3r.py):

  * Easi3R = training-free dynamic handling for DUSt3R-family models. Pass 1
    of the pair decode collects cross-attention statistics; tokens receiving
    anomalously little attention from the other view are flagged dynamic;
    pass 2 re-weights cross-attention against them and produces the pointmaps.
  * X/C come from that double inference (with the attention-derived dynamic
    masks zeroing C), D/Q from the MASt3R decoder on the shared encoder
    features (with the same masks zeroing Q).

No RAFT / SAM2 / optical flow is involved — dynamic handling is entirely
attention-based, which is the point of the Easi3R variant.
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
    parser.add_argument(
        "--easi3r-checkpoint",
        default="checkpoints/DUSt3R_ViTLarge_BaseDecoder_512_dpt.pth",
        help="DUSt3R-architecture weights driven through the two-pass "
        "attention-reweighted Easi3R inference",
    )
    parser.add_argument("--retrieval-checkpoint", default="")
    parser.add_argument("--k-mad", type=float, default=2.0,
                        help="MAD multiplier for the attention dynamic mask")
    parser.add_argument("--max-frames", type=int, default=0)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    from monst3r_slam_tpu.app import evaluate
    from monst3r_slam_tpu.app.config import config, load_config
    from monst3r_slam_tpu.app.pipeline import SLAMSystem
    from monst3r_slam_tpu.data.datasets import Intrinsics, load_dataset
    from monst3r_slam_tpu.data.preprocess import resize_img
    from monst3r_slam_tpu.dynamic.inference import EasiParams
    from monst3r_slam_tpu.models.config import MAST3R_512, MONST3R_512
    from monst3r_slam_tpu.slam import retrieval as retrieval_mod

    load_config(args.config)
    # Dynamic handling is attention-based inside the pair decode; the optical
    # flow mask machinery stays off (tracker3 has no RAFT/SAM2).
    config["use_dynamic_mask"] = False

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
    # Easi3R drives DUSt3R-style weights (same arch family as MonST3R: dual
    # decoder, DPT head, no descriptor head)
    easi_params, easi_cfg = load_or_random(
        args.easi3r_checkpoint, MONST3R_512, args.seed + 1
    )
    if config.get("bf16_params", True):
        # bf16 weight storage: compute already runs bf16; halves weight HBM
        # traffic (see models/convert.cast_params_for_inference).
        from monst3r_slam_tpu.models.convert import cast_params_for_inference

        mast3r_params = cast_params_for_inference(mast3r_params)
        easi_params = cast_params_for_inference(easi_params)
    ep = EasiParams(easi_params, easi_cfg, mast3r_params, mast3r_cfg,
                    k_mad=args.k_mad)

    K = None
    if config.get("use_calib", False) and dataset.has_calib():
        K = np.asarray(dataset.camera_intrinsics.K_frame, np.float32)

    retr_params = retrieval_mod.init_retrieval_params(
        jax.random.PRNGKey(1), easi_cfg.enc_dim
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
        easi3r=ep,
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
