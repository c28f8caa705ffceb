"""Coverage for metrics writer, profiling timer, NDC rendering, debug heatmap."""
import csv
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

from nerfpp_tpu.utils.metrics import MetricsWriter
from nerfpp_tpu.utils.profiling import StepTimer


def test_metrics_writer_csv_and_images(tmp_path):
    w = MetricsWriter(tmp_path)
    w.write_scalars(10, {"loss": 0.5, "psnr": 20.0})
    w.write_scalars(20, {"loss": 0.4, "psnr": 21.0})
    rows = list(csv.DictReader(open(tmp_path / "metrics.csv")))
    assert len(rows) == 2
    assert float(rows[1]["psnr"]) == 21.0
    img = np.random.rand(8, 8, 3).astype(np.float32)
    w.write_image(10, "val", img)
    assert (tmp_path / "images" / "val_00000010.png").exists()


def test_metrics_writer_widens_header_for_late_keys(tmp_path):
    """Keys appearing after the first row (e.g. psnr once eval first runs)
    must widen the CSV header, not be silently dropped (round-2 weak #8)."""
    w = MetricsWriter(tmp_path)
    w.write_scalars(10, {"loss": 0.5})
    w.write_scalars(20, {"loss": 0.4, "psnr": 21.0})
    rows = list(csv.DictReader(open(tmp_path / "metrics.csv")))
    assert rows[0]["psnr"] == ""           # back-filled blank
    assert float(rows[1]["psnr"]) == 21.0
    # resumed run adopts the existing header and may widen it again
    w2 = MetricsWriter(tmp_path)
    w2.write_scalars(30, {"loss": 0.3, "rays_per_sec": 1e5})
    rows = list(csv.DictReader(open(tmp_path / "metrics.csv")))
    assert len(rows) == 3
    assert float(rows[2]["rays_per_sec"]) == 1e5
    assert float(rows[1]["psnr"]) == 21.0  # survived the rewrite


def test_step_timer():
    t = StepTimer(rays_per_step=1000)
    t.tick()
    t.tick()
    assert t.rays_per_sec > 0


def test_ndc_render_forward_facing():
    """NDC rendering path compiles and produces finite images."""
    from nerfpp_tpu.core import rays as R
    from nerfpp_tpu.render.renderer import (RenderConfig,
                                            make_nerf_integrate_fn,
                                            render_image)

    def toy_network(params, pts, viewdirs):
        sigma = jnp.where(jnp.abs(pts[..., 2]) < 0.5, 20.0, 0.0)
        rgb = jnp.full(pts.shape[:-1] + (3,), 1.0)
        return jnp.concatenate([rgb, sigma[..., None]], axis=-1)

    cfg = RenderConfig(n_samples=16, n_importance=0, use_viewdirs=False,
                       thin_ray=True, ndc=True, chunk=256)
    k = jnp.asarray(R.calibration_matrix(12.0, 16, 16))
    c2w = jnp.eye(4)
    bbox = jnp.array([-1.5, -1.5, -1.5, 1.5, 1.5, 1.5])
    out, _ = render_image({}, toy_network, make_nerf_integrate_fn(cfg),
                          16, 16, k, c2w, jax.random.PRNGKey(0), cfg, bbox)
    assert np.isfinite(np.asarray(out.rgb)).all()
    assert out.rgb.shape == (16, 16, 3)


def test_lerf_debug_heatmap(tmp_path):
    from nerfpp_tpu.data.pyramid_clip import (PyramidEmbedder,
                                              PyramidEmbedderProperties,
                                              RandomProjectionPatchEncoder)
    from nerfpp_tpu.render.debug import save_relevancy_heatmap

    props = PyramidEmbedderProperties(img_size=16, overlap=0.5, max_zoom_out=1)
    enc = RandomProjectionPatchEncoder(embed_dim=16, input_size=8)
    images = np.random.RandomState(0).rand(1, 64, 64, 3).astype(np.float32)
    emb = PyramidEmbedder(enc, props)(images)
    rel = save_relevancy_heatmap(
        emb, 0, enc.encode_text(["a"]), enc.encode_text(["b", "c"]),
        tmp_path / "rel.png", images[0])
    assert rel.shape == (64, 64)
    assert (tmp_path / "rel.png").exists()
    assert np.isfinite(rel).all()
