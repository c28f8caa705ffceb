"""Configuration dataclasses with JSON round-trip.

Mirrors the reference's three JSON-serializable config structs and their exact
key sets so configs interchange with the reference's artifacts:

- ``ExecutorParams``  <-> NeRFExecutorParams  (NeRFExecutor.h:31-178)
- ``TrainParams``     <-> NeRFExecutorTrainParams (NeRFExecutor.h:180-264)
- SceneData (data/dataset.py) <-> NeRFDatasetParams (NeRFDatasetParams.h)

Extra keys absent from the reference (the reference fixes them at compile time
via template instantiation, NeRFExecutor.h:299-301 / main.cpp:220-221):
``embedder_type``, ``embeddirs_type``, ``model_type``, ``hash_scheme`` select
the model stack at runtime; they default to the shipped HashNeRF stack and are
ignored by FromJson when absent.
"""
from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import List


def _json_dataclass(cls):
    """Attach to_json/from_json/save/load using the dataclass's KEYMAP."""

    def to_json(self) -> dict:
        return {k: getattr(self, f) for f, k in self.KEYMAP.items()}

    def from_json(cls_, j: dict):
        kwargs = {}
        for f, k in cls_.KEYMAP.items():
            if k in j:
                kwargs[f] = j[k]
        return cls_(**kwargs)

    def save(self, path) -> None:
        Path(path).write_text(json.dumps(self.to_json(), indent=1))

    def load(cls_, path):
        return cls_.from_json(json.loads(Path(path).read_text()))

    cls.to_json = to_json
    cls.from_json = classmethod(from_json)
    cls.save = save
    cls.load = classmethod(load)
    return cls


@_json_dataclass
@dataclasses.dataclass
class ExecutorParams:
    """Model/optimizer configuration (NeRFExecutorParams, NeRFExecutor.h:31-74).

    Defaults follow the reference declaration; main.cpp:178-219 overrides for
    the HashNeRF+LeRF run are applied by presets in executor.py.
    """
    net_depth: int = 8              # sigma-net layers (8 classic, 2-3 HashNeRF)
    net_width: int = 256            # channels per layer (256 classic, 64 Hash)
    multires: int = 10              # log2 max freq, 3D position PE
    multires_views: int = 4         # log2 max freq / SH degree for directions
    n_importance: int = 0           # additional fine samples per ray
    num_layers_color: int = 4
    hidden_dim_color: int = 64
    num_layers_normals: int = 3
    hidden_dim_normals: int = 64
    geo_feat_dim: int = 15
    use_nerf: bool = True
    use_viewdirs: bool = True
    calculate_normals: bool = False
    use_pred_normal: bool = False
    use_lerf: bool = False
    thin_ray: bool = False
    n_levels: int = 16
    n_features_per_level: int = 2
    log2_hashmap_size: int = 19
    base_resolution: int = 16
    finest_resolution: int = 512
    n_levels_le: int = 14
    n_features_per_level_le: int = 2
    log2_hashmap_size_le: int = 16
    base_resolution_le: int = 16
    finest_resolution_le: int = 128
    clip_input_img_size: int = 336
    num_layers_le: int = 3
    hidden_dim_le: int = 64
    lang_embed_dim: int = 768
    geo_feat_dim_le: int = 32
    pyr_embed_min_zoom_out: int = 0
    device: str = "tpu"
    learning_rate: float = 5e-4
    pyr_embedder_overlap: float = 0.75
    ft_path: str = ""
    path_to_clip: str = ""
    # JSON-interchange parity only (reference's RuCLIPProcessor BPE vocab,
    # NeRFExecutor.h:581-595): HF CLIPProcessor bundles its tokenizer, so
    # this path is accepted/saved but never read by the runtime
    path_to_bpe: str = ""
    lerf_positives: str = ""
    lerf_negatives: List[str] = dataclasses.field(default_factory=list)
    # runtime stack selection (compile-time templates in the reference)
    embedder_type: str = "hash"       # "frequency" | "hash"
    embeddirs_type: str = "sh"        # "frequency" | "sh"
    model_type: str = "nerf_small"    # "nerf" | "nerf_small"
    hash_scheme: str = "random"       # "fixed" (CPU variant) | "random" (CUDA)
    density_activation: str = "relu"  # "relu" (reference) | "trunc_exp" | "softplus"
    mlp_init_gain: float = 0.1        # xavier-normal gain (Trainable.h:32-53)
    compute_dtype: str = "bfloat16"   # MLP matmul dtype ("float32" | "bfloat16")
    use_pallas_encoder: bool = False  # fused VMEM hash kernel (needs T <= 2^13)
    # occupancy-guided sampling (core/occupancy.py; capability the reference
    # lacks): density-grid prior redistributes the fixed per-ray sample budget
    # into occupied space. 0 bins = off.
    use_occupancy_grid: bool = False
    occ_grid_resolution: int = 128
    occ_update_every: int = 16        # grid EMA refresh interval (steps)
    occ_n_bins: int = 64              # depth bins for the per-ray prior
    occ_uniform_frac: float = 0.1     # uniform blend (empty-space supervision)
    occ_decay: float = 0.95           # EMA decay per refresh
    # refresh one cell octant per trigger instead of the full grid (8x
    # cheaper; every cell still refreshes every 8*occ_update_every steps
    # with decay rate preserved — core/occupancy.update_grid_phased)
    occ_phased_refresh: bool = False
    # full-refresh steps before phasing kicks in: early training moves the
    # field faster than the 8*occ_update_every phased revisit period, and a
    # stale prior misplaces samples (measured -5 dB on 1/3 seeds unwarmed)
    occ_phased_warmup: int = 1024
    occ_ray_tile: int = 128           # share one CDF per N rays (0 = per-ray)
    # full-sampling steps before the tile budgets engage: the class split
    # starves DISCOVERY of structures living in sparse-class tiles (thin
    # geometry: measured -5 dB unwarmed on the thin scene variant,
    # scripts/quality_two_scenes.py); trained-state throughput is unaffected
    occ_tile_budget_warmup: int = 1024
    hier_budget_warmup: int = 0       # coarse pass already covers every ray
    # two-class per-tile sample budget (renderer.render_ray_batch_budgeted):
    # the top occ_tile_budget_frac of each batch's tiles by occupancy mass
    # get NSamples; the rest (empty space) get occ_sparse_samples. 0 = off.
    occ_tile_budget_frac: float = 0.0
    occ_sparse_samples: int = 16
    # render-time two-class budget (render_image): background tiles render
    # at render_sparse_samples. 0 = off; < 0 = AUTO — the executor probes
    # each view's occupancy tile masses and picks the fraction itself
    # (executor._auto_dense_frac), removing the scene-dependent knob.
    # (sparse 4 measured PSNR-neutral vs 8 and ~10% faster on the 800px
    # scene — background tiles are genuinely empty once ranked.)
    render_dense_frac: float = 0.0
    render_sparse_samples: int = 4
    # depth bins for the render-time dense-class prior (0 = occ_n_bins).
    # The range is probe-narrowed at render, so 32 bins inside the occupied
    # span place as finely as 64 over the full ray.
    render_prior_bins: int = 32
    # tile-share the hierarchical path's coarse z + importance CDF per N
    # consecutive rays (renderer.RenderConfig.hier_ray_tile). 0 = per-ray
    # (reference semantics); 128 keeps encode groups coherent on the
    # reference-parity 64+192 workload.
    hier_ray_tile: int = 0
    # two-class budget on the hierarchical FINE pass (no occupancy grid
    # needed — the ranking signal is the coarse pass itself): the top
    # hier_tile_budget_frac of each batch's hier_ray_tile tiles by tile-mean
    # coarse weight mass keep the full n_importance; the rest (tiles whose
    # coarse pass saw mostly empty space) get hier_sparse_importance.
    # 0 = off. Requires hier_ray_tile > 0 and n_importance > 0.
    hier_tile_budget_frac: float = 0.0
    hier_sparse_importance: int = 32
    # Data-parallel gradient all-reduce mode (multi-device meshes only):
    # "bf16" (default) assigns whole chunks to devices under shard_map and
    # all-reduces the per-device gradients in ONE bf16 psum — half the ICI
    # bytes of the fp32 reduce (the 67 MB table grads dominate; the fp32
    # master Adam update is unchanged). "f32" = same explicit psum in fp32
    # (matches the implicit path to reduction order). "implicit" = let
    # XLA's SPMD partitioner insert the fp32 all-reduce (pre-round-5
    # behavior). Falls back to implicit when n_chunks isn't a multiple of
    # the device count (e.g. chunk == n_rand).
    dp_grad_reduce: str = "bf16"
    # Collapse auto-recovery (the robustness default, VERDICT r4 #5): pure
    # occupancy-guided sampling can land thin-geometry scenes in the
    # all-white/constant-fog optimum (acc ~ 1 everywhere, near-constant
    # render — the reference never fails this way because its importance
    # pass is always on, NeRFRenderer.h:425-450). When active (occupancy
    # on, n_importance == 0), the train loop watches the batch-render
    # standard deviation (metrics["pred_std"]); if by auto_fine_check_from
    # steps it sits under auto_fine_rel_std x the GT pixel std, the loop
    # engages the occ+importance hybrid (n_importance = auto_fine_samples,
    # tile budget off — the thin-scene recipe) and rebuilds the step. One
    # recompile when (and only when) a collapse is detected; scenes that
    # train normally never pay anything.
    auto_fine_fallback: bool = True
    auto_fine_samples: int = 16
    auto_fine_check_from: int = 256
    auto_fine_rel_std: float = 0.1

    KEYMAP = {
        "net_depth": "net_depth", "net_width": "net_width",
        "multires": "multires", "multires_views": "multires_views",
        "n_importance": "n_importance",
        "num_layers_color": "num_layers_color",
        "hidden_dim_color": "hidden_dim_color",
        "num_layers_normals": "num_layers_normals",
        "hidden_dim_normals": "hidden_dim_normals",
        "geo_feat_dim": "geo_feat_dim",
        "use_nerf": "use_nerf", "thin_ray": "thin_ray",
        "use_viewdirs": "use_viewdirs",
        "calculate_normals": "calculate_normals",
        "use_pred_normal": "use_pred_normal", "use_lerf": "use_lerf",
        "n_levels": "n_levels", "n_features_per_level": "n_features_per_level",
        "log2_hashmap_size": "log2_hashmap_size",
        "base_resolution": "base_resolution",
        "finest_resolution": "finest_resolution",
        "n_levels_le": "n_levels_le",
        "n_features_per_level_le": "n_features_per_level_le",
        "log2_hashmap_size_le": "log2_hashmap_size_le",
        "base_resolution_le": "base_resolution_le",
        "finest_resolution_le": "finest_resolution_le",
        "clip_input_img_size": "clip_input_img_size",
        "num_layers_le": "num_layers_le", "hidden_dim_le": "hidden_dim_le",
        "lang_embed_dim": "lang_embed_dim", "geo_feat_dim_le": "geo_feat_dim_le",
        "pyr_embed_min_zoom_out": "lang_embed_min_zoom_out",
        "device": "device", "learning_rate": "learning_rate",
        "pyr_embedder_overlap": "pyr_embedder_overlap",
        "ft_path": "ft_path", "path_to_clip": "path_to_clip",
        "path_to_bpe": "path_to_bpe",
        "lerf_positives": "lerf_positives", "lerf_negatives": "lerf_negatives",
        "embedder_type": "embedder_type", "embeddirs_type": "embeddirs_type",
        "model_type": "model_type", "hash_scheme": "hash_scheme",
        "density_activation": "density_activation",
        "mlp_init_gain": "mlp_init_gain",
        "compute_dtype": "compute_dtype",
        "use_pallas_encoder": "use_pallas_encoder",
        "use_occupancy_grid": "use_occupancy_grid",
        "occ_grid_resolution": "occ_grid_resolution",
        "occ_update_every": "occ_update_every",
        "occ_n_bins": "occ_n_bins",
        "occ_uniform_frac": "occ_uniform_frac",
        "occ_decay": "occ_decay",
        "occ_phased_refresh": "occ_phased_refresh",
        "occ_phased_warmup": "occ_phased_warmup",
        "occ_ray_tile": "occ_ray_tile",
        "occ_tile_budget_warmup": "occ_tile_budget_warmup",
        "hier_budget_warmup": "hier_budget_warmup",
        "occ_tile_budget_frac": "occ_tile_budget_frac",
        "occ_sparse_samples": "occ_sparse_samples",
        "render_dense_frac": "render_dense_frac",
        "render_sparse_samples": "render_sparse_samples",
        "render_prior_bins": "render_prior_bins",
        "hier_ray_tile": "hier_ray_tile",
        "hier_tile_budget_frac": "hier_tile_budget_frac",
        "hier_sparse_importance": "hier_sparse_importance",
        "dp_grad_reduce": "dp_grad_reduce",
        "auto_fine_fallback": "auto_fine_fallback",
        "auto_fine_samples": "auto_fine_samples",
        "auto_fine_check_from": "auto_fine_check_from",
        "auto_fine_rel_std": "auto_fine_rel_std",
    }


@_json_dataclass
@dataclasses.dataclass
class TrainParams:
    """Training-loop configuration (NeRFExecutorTrainParams,
    NeRFExecutor.h:180-264). Field spelling preserved, including PrecorpIters."""
    pyramid_clip_embedding_save_dir: str = ""
    base_dir: str = "output"
    test_skip: bool = False
    render_only: bool = False
    ndc: bool = False
    lin_disp: bool = False
    chunk: int = 1024 * 32
    n_samples: int = 64
    n_rand: int = 32 * 32 * 4
    precorp_iters: int = 0
    n_iters: int = 50000
    lrate_decay: int = 250
    i_print: int = 100
    i_img: int = 500
    i_weights: int = 10000
    i_testset: int = 50000
    return_raw: bool = False
    render_factor: float = 0.0
    precorp_frac: float = 0.5
    # tile-coherent ray sampling (new; no reference analog): 0 = auto
    # (8x16 tiles when the blocked hash kernel is active), -1 = force off
    tile_h: int = 0
    tile_w: int = 0
    # steps per device dispatch (new): lax.scan k train steps inside one
    # executable to amortize host/interconnect dispatch latency; reduced to
    # gcd with the active logging/checkpoint intervals to keep their timing
    steps_per_call: int = 1
    # bbox re-fit at warmup end (new; needs the occupancy grid): > 0 = at
    # the first dispatch boundary past this step, shrink the scene AABB to
    # where the trained field has mass (executor.refit_bbox_from_grid) and
    # rebuild the position-keyed state. Recovers the hash/grid resolution
    # that conservative loader bounds (load_blender.h:83-124 corner-ray
    # bbox) waste on empty space. 0 = off.
    bbox_refit_step: int = 0

    KEYMAP = {
        "pyramid_clip_embedding_save_dir": "PyramidClipEmbeddingSaveDir",
        "base_dir": "BaseDir", "test_skip": "TestSkip",
        "render_only": "RenderOnly", "ndc": "Ndc", "lin_disp": "LinDisp",
        "chunk": "Chunk", "n_samples": "NSamples", "n_rand": "NRand",
        "precorp_iters": "PrecorpIters", "n_iters": "NIters",
        "lrate_decay": "LRateDecay", "i_print": "IPrint", "i_img": "IImg",
        "i_weights": "IWeights", "i_testset": "ITestset",
        "return_raw": "ReturnRaw", "render_factor": "RenderFactor",
        "precorp_frac": "PrecorpFrac",
        "tile_h": "TileH", "tile_w": "TileW",
        "steps_per_call": "StepsPerCall",
        "bbox_refit_step": "BboxRefitStep",
    }


def hashnerf_preset(**overrides) -> ExecutorParams:
    """The shipped HashNeRF+SH stack configuration (main.cpp:178-219):
    NeRFSmall 3x64, 192 importance samples, 16-level hash with T=2^19,
    base 16 -> finest 1024, SH degree 8 dirs, Adam lr 1e-2."""
    p = ExecutorParams(
        net_depth=3, net_width=64, multires_views=8, n_importance=192,
        num_layers_color=4, hidden_dim_color=64, geo_feat_dim=15,
        n_levels=16, n_features_per_level=2, log2_hashmap_size=19,
        base_resolution=16, finest_resolution=1024,
        learning_rate=1e-2,
        embedder_type="hash", embeddirs_type="sh", model_type="nerf_small",
        # TPU flagship training recipe: exp density (no dead-ReLU collapse)
        # and full-scale init — measured +10 dB over the reference's
        # relu + 0.1-gain combination at equal step counts
        density_activation="trunc_exp", mlp_init_gain=1.0,
        # hierarchical-path TPU accelerations, measured PSNR-neutral on the
        # 64+192 reference workload (PERFORMANCE.md hier-budget study):
        # tile-shared coarse z + importance CDF keeps encode groups
        # coherent (+48% rays/s), and the coarse-ranked fine-pass budget
        # (top 25% of tiles keep full n_importance, rest get 16) adds
        # another ~1.8x. Exact per-ray reference semantics: hier_ray_tile=0.
        hier_ray_tile=128, hier_tile_budget_frac=0.25,
        hier_sparse_importance=16)
    for k, v in overrides.items():
        setattr(p, k, v)
    return p


def hashnerf_tpu_preset(**overrides) -> ExecutorParams:
    """Small-table TPU HashNeRF: VMEM-resident tables (T=2^13) with the
    in-VMEM fused Pallas encode kernel (PERFORMANCE.md). Same architecture
    otherwise. For full reference capacity use hashnerf_blocked_preset (the
    benchmark flagship)."""
    p = hashnerf_preset(log2_hashmap_size=13, use_pallas_encoder=True)
    for k, v in overrides.items():
        setattr(p, k, v)
    return p


def hashnerf_blocked_preset(**overrides) -> ExecutorParams:
    """Reference-capacity HashNeRF on the TPU fast path: T=2^19 tables in the
    blocked halo layout (encoders/hashgrid.py scheme="blocked") with the
    windowed Pallas encode/scatter kernel pair (pallas/hash_encode_blocked.py).
    Parameter count matches the reference's shipped config exactly
    (main.cpp:189); pairs with tile-coherent sampling (TrainParams.tile_h/w
    auto) and sample-major point ordering for kernel throughput.

    When the occupancy grid is enabled, the two-class tile sample budget
    defaults ON for training (frac 0.5 / 16 sparse samples — measured
    quality-neutral-or-better across 3 seeds at +24% rays/s) and for
    rendering in AUTO mode (render_dense_frac=-1: each view's fraction is
    derived from its occupancy tile masses, executor._auto_dense_frac — a
    fixed 0.20 measured +0.1 dB at 3.6x Mpix/s on the object-centric bench
    scene but would starve scenes whose geometry fills the frame; auto
    adapts and falls back to unbudgeted when ineligible, e.g. NDC);
    scripts/quality_tile_budget*.py + render_budget_check.py hold the
    studies. The occupancy refresh is octant-phased after a 1024-step
    full-refresh warmup (+34% steady rays/s; quality-neutral and MORE
    seed-stable than full refresh, scripts/quality_phased.py — mean
    31.3 vs 30.0 dB, spread 0.7 vs 7.5 dB across 3 seeds)."""
    p = hashnerf_preset(hash_scheme="blocked", use_pallas_encoder=True,
                        occ_tile_budget_frac=0.5, occ_sparse_samples=16,
                        render_dense_frac=-1.0, render_sparse_samples=2,
                        occ_phased_refresh=True)
    for k, v in overrides.items():
        setattr(p, k, v)
    return p


def classic_nerf_preset(**overrides) -> ExecutorParams:
    """The classic-NeRF stack (Embedder positions + Embedder dirs + NeRF MLP)."""
    p = ExecutorParams(
        net_depth=8, net_width=256, multires=10, multires_views=4,
        n_importance=0, learning_rate=5e-4,
        embedder_type="frequency", embeddirs_type="frequency",
        model_type="nerf")
    for k, v in overrides.items():
        setattr(p, k, v)
    return p
