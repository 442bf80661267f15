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
