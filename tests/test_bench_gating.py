"""bench.py's evidence-gating helpers decide the driver-visible labels
(`value_mode`, `value_exact` membership) — lock their semantics down.

Round-5 semantics: a pallas mode joins the exact class only on sweep
EVIDENCE of a worst-cell u8 envelope ≤ EXACT_CLASS_CAP_LSB (absolute cap
— the relative "≤ exact-erf's own cell" criterion became meaningless
once the r5 sweep showed the whole bf16-plane family sharing one
envelope on trained models).
"""

import sys

import pytest

import bench


@pytest.fixture
def fake_rows(monkeypatch):
    rows = [
        # bf16 family at the shared trained-model envelope (fp8 cell)
        {"cell": "m1_fp8", "mip": 0,
         "pallas_exact_max_lsb": 7, "pallas_tanh_max_lsb": 7,
         "pallas_tanherf_max_lsb": 7,
         "pallas_surgical_exact_max_lsb": 1,
         "pallas_surgical_tanh_max_lsb": 3,
         "pallas_i16_tanh_max_lsb": 2,
         "pallas_fp32_exact_max_lsb": 1},
        {"cell": "m1_fp2", "mip": 0,
         "pallas_exact_max_lsb": 3, "pallas_tanh_max_lsb": 3,
         "pallas_tanherf_max_lsb": 3,
         "pallas_surgical_exact_max_lsb": 2,
         "pallas_surgical_tanh_max_lsb": 2,
         "pallas_i16_tanh_max_lsb": 1,
         "pallas_fp32_exact_max_lsb": 2},
        # an errored cell must be ignored, not poison the gate
        {"cell": "m3_fp8", "error": "SomeError: boom"},
        # a 3D cell (separate ff3/v3 kernel path): gates the 3D fields
        # only — must NOT poison the 2D headline's envelope
        {"cell": "m4_fp8", "mip": 0,
         "pallas_exact_max_lsb": 6, "pallas_tanh_max_lsb": 6,
         "pallas_i16_tanh_max_lsb": 5,
         "pallas_fp32_exact_max_lsb": 2},
    ]
    monkeypatch.setattr(bench, "_parity_rows", lambda: rows)
    return rows


def test_mode_envelope_is_worst_cell(fake_rows):
    assert bench._mode_envelope("exact") == 7
    assert bench._mode_envelope("surgical_tanh") == 3
    assert bench._mode_envelope("i16_tanh") == 2
    assert bench._mode_envelope("nonexistent") is None


def test_mode_envelope_is_per_geometry(fake_rows):
    # 2D headline fields are gated by 2D cells; 3D fields by m3/m4
    # cells — the two kernels' envelopes must not pool (i16 is ≤3 on
    # the 2D kernel but 5 on the 3D one here)
    assert bench._mode_envelope("i16_tanh", ndim=2) == 2
    assert bench._mode_envelope("i16_tanh", ndim=3) == 5
    assert bench._sweep_confirms("i16_tanh", ndim=2)
    assert not bench._sweep_confirms("i16_tanh", ndim=3)
    # a mode measured only on 2D cells has no 3D envelope
    assert bench._mode_envelope("surgical_tanh", ndim=3) is None


def test_exact_class_is_absolute_cap(fake_rows):
    # bf16 family: 7-LSB worst cell → OUT, even though tanh ≤ exact
    # per-cell (the r4 relative criterion would wrongly admit it)
    assert not bench._sweep_confirms("exact")
    assert not bench._sweep_confirms("tanh")
    # split-storage modes within the cap → IN
    assert bench._sweep_confirms("surgical_tanh")
    assert bench._sweep_confirms("surgical_exact")
    assert bench._sweep_confirms("i16_tanh")
    assert bench._sweep_confirms("fp32_exact")


def test_no_rows_means_no_confirmation(monkeypatch):
    monkeypatch.setattr(bench, "_parity_rows", lambda: [])
    assert not bench._sweep_confirms("exact")
    assert bench._mode_envelope("exact") is None


def test_headline_label_reports_measured_envelope(fake_rows):
    lbl = bench._headline_label("pallas bf16 tanh-gelu", "tanh")
    assert "≤7 u8 LSB" in lbl and "worst-cell" in lbl
    # no gelu (xla/fast winner): label passes through
    assert bench._headline_label("xla fp32", None) == "xla fp32"
    # unmeasured mode: no envelope claim
    assert bench._headline_label("pallas x", "nonexistent") == "pallas x"
