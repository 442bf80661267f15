"""Bench sweep harness: rendering and reference mapping (no TPU)."""

from recsys_tpu.bench.sweep import REFERENCE_S, format_markdown


def _row(**kw):
    base = dict(
        instance="instML100k",
        dtype="float32",
        path="pallas",
        wall_s=0.38,
        updates_per_s=7.9e8,
        iters=3000,
        nnz=100000,
        users=943,
        items=1682,
        k=30,
        golden_exact=False,
        agreement=0.9894,
    )
    base.update(kw)
    return base


def test_markdown_contains_speedups():
    md = format_markdown([_row()])
    assert "instML100k" in md
    # 104.93 / 0.38 ≈ 276x vs serial, 13.922 / 0.38 ≈ 36.6x vs best.
    assert "276.1x" in md and "36.6x" in md and "98.94%" in md


def test_markdown_exact_flag():
    md = format_markdown([_row(golden_exact=True, agreement=1.0)])
    assert "| exact |" in md


def test_gen_instances_map_to_original_reference():
    md = format_markdown(
        [_row(instance="gen-instML1M", wall_s=12.5201, agreement=None)]
    )
    # Maps to instML1M's (125.201, 8.60): 10x vs serial.
    assert "10.0x" in md


def test_unknown_instance_renders_dashes():
    md = format_markdown([_row(instance="gen-instX", agreement=None)])
    assert "| - | - |" in md


def test_reference_table_covers_published_instances():
    for k in ("instML100k", "instML1M", "inst50000-5000-100-2-5"):
        serial, best = REFERENCE_S[k]
        assert serial >= best > 0


def test_effective_train_s_guards():
    """Marginal walls are trusted only when the train is long enough to
    difference (>=0.2 s) and the slope explains >=half of it; otherwise
    the single-call train (or the end-to-end wall) is used."""
    from recsys_tpu.bench.sweep import effective_train_s

    good = {"train_s": 1.5, "train_marginal_s": 1.35, "wall_s": 2.0}
    assert effective_train_s(good) == 1.35
    noise = {"train_s": 0.0097, "train_marginal_s": 0.0007, "wall_s": 0.15}
    assert effective_train_s(noise) == 0.0097  # sub-0.2s: marginal untrusted
    fixed_dominated = {"train_s": 1.0, "train_marginal_s": 0.3, "wall_s": 2.0}
    assert effective_train_s(fixed_dominated) == 1.0  # slope < half: noise
    bare = {"wall_s": 3.0}
    assert effective_train_s(bare) == 3.0


def test_sub_resolution_pct_clamps_visibly():
    """A >100% percentage from a sub-50ms train clamps to 100 with a '~'
    marker; above the resolution floor a >100% value stays raw (a real
    calibration breach must stay visible)."""
    from recsys_tpu.bench.sweep import _clamp_sub_resolution_pct

    r = {"pct_roofline": 117.9, "roofline_model": "mxu", "train_s": 0.018,
         "wall_s": 0.3}
    _clamp_sub_resolution_pct(r)
    assert r["pct_roofline"] == 100.0 and r["roofline_model"] == "~mxu"
    r2 = {"pct_roofline": 104.0, "roofline_model": "gather", "train_s": 5.0,
          "wall_s": 6.0}
    _clamp_sub_resolution_pct(r2)
    assert r2["pct_roofline"] == 104.0 and r2["roofline_model"] == "gather"
