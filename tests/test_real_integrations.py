"""Exercise the real-CLIP and real-COLMAP entry points (VERDICT r3 #6).

Both wrap external systems the reference shells into directly —
`load_clip_encoder` (pyramid_clip.py) vs the RuCLIP disk load
(NeRFExecutor.h:581-595), and `run_colmap_reconstruction` (colmap.py) vs
AutomaticReconstructionController (ColmapReconstruction.cpp:193-211).
Neither external system ships in CI, so:

- CLIP: build a TINY random-weight HF CLIP checkpoint on disk (config +
  save_pretrained, no network) and run the REAL
  CLIPModel/CLIPProcessor.from_pretrained path end to end.
- COLMAP: verify the exact subprocess argv contract under a mock, plus a
  `shutil.which("colmap")`-gated real smoke.
"""
import json
import subprocess
from pathlib import Path

import numpy as np
import pytest


# --------------------------------------------------------------------------
# real-CLIP path: tiny local checkpoint through the genuine HF loaders
# --------------------------------------------------------------------------

def _write_tiny_clip(tmp: Path) -> str:
    """Save a random-weight 2-layer CLIP + processor to ``tmp`` (no network)."""
    import string

    from transformers import (CLIPConfig, CLIPImageProcessor, CLIPModel,
                              CLIPProcessor, CLIPTextConfig, CLIPTokenizer,
                              CLIPVisionConfig)

    # minimal BPE assets: single-char tokens (with and without the
    # end-of-word marker) + the two specials CLIPTokenizer requires
    toks = ["<|startoftext|>", "<|endoftext|>"]
    for ch in string.ascii_lowercase + string.digits + " .,!?'":
        toks += [ch, ch + "</w>"]
    vocab = {t: i for i, t in enumerate(dict.fromkeys(toks))}
    (tmp / "vocab.json").write_text(json.dumps(vocab))
    (tmp / "merges.txt").write_text("#version: 0.2\n")
    tok = CLIPTokenizer(str(tmp / "vocab.json"), str(tmp / "merges.txt"))

    img_proc = CLIPImageProcessor(size={"shortest_edge": 30},
                                  crop_size={"height": 30, "width": 30})
    CLIPProcessor(image_processor=img_proc, tokenizer=tok).save_pretrained(tmp)

    cfg = CLIPConfig.from_text_vision_configs(
        # bos/eos must match the tiny vocab: CLIP pools the text embedding
        # at the eos position via text_config.eos_token_id (default 49407)
        CLIPTextConfig(hidden_size=32, intermediate_size=64,
                       num_hidden_layers=2, num_attention_heads=4,
                       vocab_size=len(vocab), max_position_embeddings=77,
                       bos_token_id=vocab["<|startoftext|>"],
                       eos_token_id=vocab["<|endoftext|>"],
                       pad_token_id=vocab["<|endoftext|>"]),
        CLIPVisionConfig(hidden_size=32, intermediate_size=64,
                         num_hidden_layers=2, num_attention_heads=4,
                         image_size=30, patch_size=15),
        projection_dim=24)
    CLIPModel(cfg).save_pretrained(tmp)
    return str(tmp)


def test_load_clip_encoder_real_hf_path(tmp_path):
    pytest.importorskip("torch")
    pytest.importorskip("transformers")
    from nerfpp_tpu.data.pyramid_clip import load_clip_encoder

    path = _write_tiny_clip(tmp_path)
    encode_images, encode_text = load_clip_encoder(path)

    rng = np.random.default_rng(0)
    patches = rng.uniform(size=(3, 30, 30, 3)).astype(np.float32)
    feats = encode_images(patches)
    assert feats.shape == (3, 24) and np.isfinite(feats).all()
    # different patches must produce different embeddings (the wrapper
    # actually forwards the pixels, not a cached constant)
    assert not np.allclose(feats[0], feats[1])

    tfeats = encode_text(["a red cube", "blue sphere!"])
    assert tfeats.shape == (2, 24) and np.isfinite(tfeats).all()
    assert not np.allclose(tfeats[0], tfeats[1])


def test_pyramid_embedder_with_real_clip(tmp_path):
    """The full pyramid pipeline runs on the real-CLIP encode_images."""
    pytest.importorskip("torch")
    pytest.importorskip("transformers")
    pytest.importorskip("cv2")
    from nerfpp_tpu.data.pyramid_clip import (PyramidEmbedder,
                                              PyramidEmbedderProperties,
                                              load_clip_encoder)

    path = _write_tiny_clip(tmp_path)
    encode_images, _ = load_clip_encoder(path)
    props = PyramidEmbedderProperties(img_size=16, overlap=0.5,
                                      max_zoom_out=0, min_zoom_out=0)
    img = np.random.default_rng(1).uniform(size=(32, 32, 3)).astype(np.float32)
    emb = PyramidEmbedder(encode_images, props)(img[None])
    xy = np.array([8.0, 20.0], np.float32)
    feats = emb.get_pixel_values(0, xy, xy, scale=0.5)
    assert feats.shape == (2, 24) and np.isfinite(feats).all()
    # get_pixel_values L2-normalizes the supervision embedding
    np.testing.assert_allclose(np.linalg.norm(feats, axis=-1), 1.0, atol=1e-5)


# --------------------------------------------------------------------------
# real-COLMAP path: argv contract under mock + which()-gated real smoke
# --------------------------------------------------------------------------

def test_run_colmap_reconstruction_argv(tmp_path, monkeypatch):
    from nerfpp_tpu.data import colmap as C

    calls = []
    monkeypatch.setattr(C.shutil, "which", lambda name: "/usr/bin/colmap")
    monkeypatch.setattr(C.subprocess, "run",
                        lambda argv, **kw: calls.append((argv, kw)))
    ws = tmp_path / "work" / "space"
    C.run_colmap_reconstruction(tmp_path / "images", ws, quality="medium")

    assert ws.is_dir()  # workspace created before the shell-out
    (argv, kw), = calls
    assert argv[0] == "colmap" and argv[1] == "automatic_reconstructor"
    opts = dict(zip(argv[2::2], argv[3::2]))
    assert opts == {"--workspace_path": str(ws),
                    "--image_path": str(tmp_path / "images"),
                    "--camera_model": "OPENCV",
                    "--single_camera": "1",
                    "--quality": "medium",
                    "--use_gpu": "0"}
    assert kw.get("check") is True  # SfM failure must fail loudly


def test_run_colmap_reconstruction_missing_binary(tmp_path, monkeypatch):
    from nerfpp_tpu.data import colmap as C

    monkeypatch.setattr(C.shutil, "which", lambda name: None)
    with pytest.raises(RuntimeError, match="colmap binary not found"):
        C.run_colmap_reconstruction(tmp_path / "img", tmp_path / "ws")


@pytest.mark.skipif(__import__("shutil").which("colmap") is None,
                    reason="colmap binary not installed")
def test_run_colmap_reconstruction_real(tmp_path):
    """Tiny real SfM smoke (only where a colmap binary exists)."""
    from nerfpp_tpu.data.colmap import (load_colmap_scene,
                                        run_colmap_reconstruction)
    from nerfpp_tpu.data.synthetic import make_synthetic_scene

    try:
        import cv2
    except ImportError:
        pytest.skip("cv2 required to write input images")
    scene = make_synthetic_scene(n_train=6, n_val=0, n_test=0, image_hw=64,
                                 n_samples=32)
    img_dir = tmp_path / "images"
    img_dir.mkdir()
    for i, v in enumerate(scene.views):
        cv2.imwrite(str(img_dir / f"{i:03d}.png"),
                    (scene.images[v.id][..., ::-1] * 255).astype(np.uint8))
    ws = tmp_path / "ws"
    run_colmap_reconstruction(img_dir, ws, quality="low")
    out = load_colmap_scene(ws, img_dir)
    assert len(out.views) >= 2
