import os

import numpy as np

from cppf_tpu.config import CONFIG_ROOT, load_config, parse_cli_overrides

ALL_CATEGORIES = [f[:-5] for f in os.listdir(os.path.join(CONFIG_ROOT, "category"))
                  if f.endswith(".yaml") and f != "laptop_aux.yaml"]


def test_all_category_configs_load():
    assert len(ALL_CATEGORIES) == 12
    for cat in ALL_CATEGORIES:
        cfg = load_config(cat)
        assert cfg.category == cat
        assert cfg.vote_range[0] > 0
        assert len(cfg.scale_mean) == 3
        edge = cfg.resolved_grid_edge()
        assert 16 <= edge <= 256, (cat, edge)
        assert cfg.out_dim == 2 * cfg.tr_num_bins + 2 * cfg.rot_num_bins + 5


def test_reference_category_semantics():
    """Spot-check flags against the reference category configs."""
    assert load_config("bottle").up_sym and not load_config("bottle").regress_right
    assert load_config("mug").up_sym and load_config("mug").regress_right
    assert not load_config("bowl").up_sym
    assert load_config("laptop").res == 1e-2
    assert load_config("chair").res == 3e-2


def test_cli_overrides():
    ov = parse_cli_overrides(["opt.lr=5e-4", "max_epoch=10", "cls_bins=false",
                              "vote_range=[0.3, 0.3]"])
    cfg = load_config("bowl", ov)
    assert cfg.opt.lr == 5e-4
    assert cfg.max_epoch == 10
    assert cfg.cls_bins is False
    assert tuple(cfg.vote_range) == (0.3, 0.3)


def test_snapshot_priority(tmp_path):
    cfg = load_config("can")
    cfg.res = 0.123
    cfg.save(str(tmp_path / "snap.yaml"))
    cfg2 = load_config("bowl", snapshot=str(tmp_path / "snap.yaml"))
    assert cfg2.category == "can"
    assert cfg2.res == 0.123


def test_seed_reroll(tmp_path):
    """cfg.seed drives the data stream (variance re-rolls) and survives the
    snapshot roundtrip; default 0 keeps historical runs bit-identical."""
    from cppf_tpu.data.shapenet import ShapeNetRenderDataset

    cfg = load_config("bowl", parse_cli_overrides(["seed=7"]))
    assert cfg.seed == 7
    cfg.save(str(tmp_path / "snap.yaml"))
    assert load_config("bowl", snapshot=str(tmp_path / "snap.yaml")).seed == 7
    a = ShapeNetRenderDataset(cfg, seed=0).sample().pc
    b = ShapeNetRenderDataset(cfg, seed=7).sample().pc
    assert a.shape != b.shape or not np.allclose(a, b)
