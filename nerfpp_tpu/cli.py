"""Command-line interface over the JSON configs.

The reference has no CLI at all — main.cpp hard-codes every parameter
(main.cpp:172-260) and merely *saves* the three JSON configs at the end. This
CLI closes that gap (SURVEY.md §5 "config/flag system"): every run is driven by
the same JSON config surface the reference writes, plus presets and per-field
overrides.

Usage:
  python -m nerfpp_tpu.cli train --dataset-type blender --data-dir <dir> \
      --preset hashnerf --base-dir out [--executor-params p.json] \
      [--train-params tp.json] [--set learning_rate=1e-2] [--set-train NIters=8100]
  python -m nerfpp_tpu.cli render --base-dir out --executor-params ... \
      --data-dir <dir> [--spherical-path]
  python -m nerfpp_tpu.cli bench
"""
from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def _apply_overrides(obj, pairs, keymap_reverse=None):
    for pair in pairs or []:
        k, _, v = pair.partition("=")
        field = k
        if keymap_reverse and k in keymap_reverse:
            field = keymap_reverse[k]
        if not hasattr(obj, field):
            raise SystemExit(f"unknown config field: {k}")
        cur = getattr(obj, field)
        if isinstance(cur, bool):
            val = v.lower() in ("1", "true", "yes")
        elif isinstance(cur, int):
            val = int(v)
        elif isinstance(cur, float):
            val = float(v)
        elif isinstance(cur, list):
            val = json.loads(v)
        else:
            val = v
        setattr(obj, field, val)
    return obj


def _load_scene(args):
    from nerfpp_tpu.data.blender import load_blender_data
    from nerfpp_tpu.data.synthetic import make_synthetic_scene

    if args.dataset_type == "blender":
        return load_blender_data(args.data_dir, half_res=args.half_res,
                                 testskip=args.test_skip,
                                 white_bkgr=args.white_bkgr)
    if args.dataset_type == "colmap":
        from nerfpp_tpu.data.colmap import load_from_colmap_reconstruction
        scene = load_from_colmap_reconstruction(args.data_dir)
        scene.white_bkgr = args.white_bkgr
        return scene
    if args.dataset_type == "synthetic":
        return make_synthetic_scene(white_bkgr=args.white_bkgr)
    raise SystemExit(f"unknown dataset type {args.dataset_type}")


def _build_params(args):
    from nerfpp_tpu.config import (ExecutorParams, TrainParams,
                                   classic_nerf_preset, hashnerf_preset,
                                   hashnerf_blocked_preset, hashnerf_tpu_preset)
    if args.executor_params:
        p = ExecutorParams.load(args.executor_params)
    elif args.preset == "hashnerf":
        p = hashnerf_preset()
    elif args.preset == "hashnerf_blocked":
        p = hashnerf_blocked_preset()
    elif args.preset == "hashnerf_tpu":
        p = hashnerf_tpu_preset()
    elif args.preset == "classic":
        p = classic_nerf_preset()
    else:
        p = ExecutorParams()
    tp = (TrainParams.load(args.train_params) if args.train_params
          else TrainParams())
    if getattr(args, "base_dir", None):
        tp.base_dir = args.base_dir
    _apply_overrides(p, args.set)
    rev = {v: k for k, v in TrainParams.KEYMAP.items()}
    _apply_overrides(tp, args.set_train, rev)
    return p, tp


def _build_lerf_supervision(scene, p, tp):
    """Pyramid CLIP embeddings for LeRF training (cache-or-compute, mirroring
    InitializePyramidClipEmbedding). Uses a real CLIP checkpoint when
    path_to_clip is set, else the deterministic random-projection stand-in."""
    import numpy as np
    from nerfpp_tpu.data.dataset import load_images
    from nerfpp_tpu.data.pyramid_clip import (PyramidEmbedderProperties,
                                              RandomProjectionPatchEncoder,
                                              compute_or_load_pyramid,
                                              load_clip_encoder,
                                              make_device_pyramid)

    if p.path_to_clip:
        encode_images, encode_text = load_clip_encoder(p.path_to_clip)
    else:
        stub = RandomProjectionPatchEncoder(embed_dim=p.lang_embed_dim)
        encode_images, encode_text = stub, stub.encode_text
    props = PyramidEmbedderProperties(
        img_size=p.clip_input_img_size, overlap=p.pyr_embedder_overlap,
        max_zoom_out=max(p.pyr_embed_min_zoom_out, 1))
    train_idx = list(scene.split_indices("train"))
    images = load_images(scene, train_idx)
    # shrink the CLIP window if images are smaller than the model input
    if min(images.shape[1:3]) < props.img_size * 2:
        props.img_size = max(8, min(images.shape[1:3]) // 4)
    cache = Path(tp.pyramid_clip_embedding_save_dir or tp.base_dir) \
        / "pyramid_embeddings.npz"
    pyramid = compute_or_load_pyramid(images, encode_images, props, cache)
    # device-side trilinear lookup per step instead of a dense per-pixel
    # stack: ~0.4 MB/(image, zoom) instead of H*W*E*4 bytes per image
    return make_device_pyramid(pyramid, scale=0.5), encode_text


def cmd_train(args) -> None:
    from nerfpp_tpu.executor import NeRFExecutor

    scene = _load_scene(args)
    p, tp = _build_params(args)
    ex = NeRFExecutor(p)
    base_dir = Path(tp.base_dir)
    base_dir.mkdir(parents=True, exist_ok=True)
    lang_embeddings = None
    if p.use_lerf:
        lang_embeddings, encode_text = _build_lerf_supervision(scene, p, tp)
        ex.set_clip_encoder(encode_text)
        if p.lerf_positives:
            ex.set_lerf_prompts(p.lerf_positives, p.lerf_negatives)
    mesh = None
    if args.n_devices != 1:
        import jax
        from nerfpp_tpu.parallel import mesh as mesh_utils
        n = args.n_devices if args.n_devices > 0 else jax.device_count()
        if tp.n_rand % n:
            raise SystemExit(f"NRand ({tp.n_rand}) must divide by the "
                             f"device count ({n}) for data parallelism")
        mesh = mesh_utils.make_mesh(n)
        print(f"data-parallel over {n} devices: {mesh}")
    ex.train(scene, tp, lang_embeddings=lang_embeddings, mesh=mesh)
    ex.save_checkpoint(base_dir)
    # save all three configs like main.cpp:257-259
    p.save(base_dir / "executor_params.json")
    tp.save(base_dir / "executor_train_params.json")
    scene.save(base_dir / "data.json")
    print(f"done; artifacts in {base_dir}")


def cmd_render(args) -> None:
    from nerfpp_tpu.core.rays import pose_spherical
    from nerfpp_tpu.executor import NeRFExecutor

    scene = _load_scene(args)
    p, tp = _build_params(args)
    if not p.ft_path:
        p.ft_path = tp.base_dir
    ex = NeRFExecutor(p)
    ex.white_bkgr = scene.white_bkgr
    ex.initialize(scene.bounding_box, tp.lrate_decay)
    v0 = scene.views[0]
    if args.spherical_path:
        poses = [pose_spherical(th, -30.0, 4.0)
                 for th in np.linspace(-180, 180, args.n_poses, endpoint=False)]
    else:
        poses = [scene.views[i].pose for i in scene.split_indices("test")] \
            or [v.pose for v in scene.views[:args.n_poses]]
    mesh = None
    if args.n_devices != 1:
        import jax
        from nerfpp_tpu.parallel import mesh as mesh_utils
        n = args.n_devices if args.n_devices > 0 else jax.device_count()
        mesh = mesh_utils.make_mesh(n)
        print(f"view-parallel render over {n} devices: {mesh}")
    out_dir = Path(tp.base_dir) / "renders"
    ex.render_path(poses, v0.h, v0.w, v0.k, tp, out_dir, mesh=mesh)
    print(f"wrote {len(poses)} renders to {out_dir}")


def cmd_bench(args) -> None:
    import bench
    bench.main()


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(prog="nerfpp_tpu",
                                 description="TPU-native NeRF/HashNeRF/LeRF")
    sub = ap.add_subparsers(dest="cmd", required=True)

    def common(s):
        s.add_argument("--dataset-type", default="synthetic",
                       choices=["blender", "colmap", "synthetic"])
        s.add_argument("--data-dir", default="")
        s.add_argument("--half-res", action="store_true")
        s.add_argument("--test-skip", action="store_true")
        s.add_argument("--white-bkgr", action="store_true")
        s.add_argument("--preset", default="hashnerf",
                       choices=["hashnerf", "hashnerf_blocked", "hashnerf_tpu",
                                "classic", "none"])
        s.add_argument("--executor-params", default="")
        s.add_argument("--train-params", default="")
        s.add_argument("--n-devices", type=int, default=1, metavar="N",
                       help="data-parallel device count for training "
                            "(0 = all visible devices; 1 = single chip)")
        s.add_argument("--base-dir", default="output")
        s.add_argument("--set", action="append", metavar="FIELD=VALUE",
                       help="override an ExecutorParams field")
        s.add_argument("--set-train", action="append", metavar="FIELD=VALUE",
                       help="override a TrainParams field (JSON key names ok)")

    t = sub.add_parser("train", help="train a radiance field")
    common(t)
    t.set_defaults(fn=cmd_train)

    r = sub.add_parser("render", help="render a trained field")
    common(r)
    r.add_argument("--spherical-path", action="store_true")
    r.add_argument("--n-poses", type=int, default=40)
    r.set_defaults(fn=cmd_render)

    b = sub.add_parser("bench", help="run the benchmark")
    b.set_defaults(fn=cmd_bench)
    return ap


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
