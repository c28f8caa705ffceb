"""Config JSON round-trip tests (key-set parity with NeRFExecutor.h JSON)."""
import json

from nerfpp_tpu.config import (ExecutorParams, TrainParams, classic_nerf_preset,
                               hashnerf_preset)


def test_executor_params_roundtrip(tmp_path):
    p = hashnerf_preset(use_lerf=True, lerf_positives="cup",
                        lerf_negatives=["object", "texture"])
    f = tmp_path / "executor_params.json"
    p.save(f)
    q = ExecutorParams.load(f)
    assert q == p


def test_train_params_roundtrip(tmp_path):
    tp = TrainParams(n_iters=8100, n_rand=16384, chunk=4096, precorp_iters=100)
    f = tmp_path / "executor_train_params.json"
    tp.save(f)
    assert TrainParams.load(f) == tp


def test_reference_json_keys_present(tmp_path):
    """The serialized key set must include every key the reference writes
    (NeRFExecutor.h:75-118, 203-225)."""
    p = ExecutorParams()
    j = p.to_json()
    for key in ["net_depth", "net_width", "multires", "multires_views",
                "n_importance", "num_layers_color", "hidden_dim_color",
                "num_layers_normals", "hidden_dim_normals", "geo_feat_dim",
                "use_nerf", "thin_ray", "use_viewdirs", "calculate_normals",
                "use_pred_normal", "use_lerf", "n_levels",
                "n_features_per_level", "log2_hashmap_size", "base_resolution",
                "finest_resolution", "n_levels_le", "n_features_per_level_le",
                "log2_hashmap_size_le", "base_resolution_le",
                "finest_resolution_le", "clip_input_img_size", "num_layers_le",
                "hidden_dim_le", "lang_embed_dim", "geo_feat_dim_le",
                "lang_embed_min_zoom_out", "device", "learning_rate",
                "pyr_embedder_overlap", "ft_path", "path_to_clip",
                "path_to_bpe", "lerf_positives", "lerf_negatives"]:
        assert key in j, key

    tj = TrainParams().to_json()
    for key in ["PyramidClipEmbeddingSaveDir", "BaseDir", "TestSkip",
                "RenderOnly", "Ndc", "LinDisp", "Chunk", "NSamples", "NRand",
                "PrecorpIters", "NIters", "LRateDecay", "IPrint", "IImg",
                "IWeights", "ITestset", "ReturnRaw", "RenderFactor",
                "PrecorpFrac"]:
        assert key in tj, key


def test_from_json_tolerates_missing_extension_keys():
    """Configs written by the reference lack our stack-selection keys."""
    j = ExecutorParams().to_json()
    for extra in ["embedder_type", "embeddirs_type", "model_type",
                  "hash_scheme", "density_activation", "mlp_init_gain"]:
        j.pop(extra, None)
    p = ExecutorParams.from_json(j)
    assert p.embedder_type == "hash"


def test_presets():
    hp = hashnerf_preset()
    assert hp.net_depth == 3 and hp.finest_resolution == 1024
    assert hp.learning_rate == 1e-2 and hp.n_importance == 192
    cp = classic_nerf_preset()
    assert cp.net_depth == 8 and cp.model_type == "nerf"
