"""Tests: span timers, profiler trace capture, NaN checks, NTC resume."""

import glob
import os

import numpy as np
import pytest

from nic.config import CompressionConfig
from nic.obs.trace import SpanTimer, enable_nan_checks, profile_trace
from nic.train.ntc import NTCTrainer


def test_span_timer():
    t = SpanTimer()
    with t.span("a"):
        pass
    with t.span("a"):
        pass
    with t.span("b"):
        pass
    rep = t.report()
    assert rep["a"]["count"] == 2 and rep["b"]["count"] == 1
    assert rep["a"]["total_s"] >= 0


def test_profile_trace_writes_files(tmp_path):
    import jax
    import jax.numpy as jnp

    d = str(tmp_path / "trace")
    with profile_trace(d):
        jax.block_until_ready(jax.jit(lambda x: x * 2)(jnp.ones((128, 128))))
    files = glob.glob(os.path.join(d, "**", "*"), recursive=True)
    assert any(os.path.isfile(f) for f in files)


def test_nan_checks_toggle():
    import jax
    import jax.numpy as jnp

    enable_nan_checks(True)
    try:
        with pytest.raises(FloatingPointError):
            jax.jit(lambda x: jnp.log(x))(jnp.zeros(()) - 1.0).block_until_ready()
    finally:
        enable_nan_checks(False)


def test_ntc_checkpoint_resume(tmp_path):
    cfg = CompressionConfig(
        image_size=16, crop_mip_level=3, num_crops=2, num_epochs=40,
        fp_bits=4, feature_pyramid_channels=2, pe_channels=4,
        hidden_layer_channels=8, tf_no_mip=True, seed=0,
    )
    y, x = np.mgrid[0:16, 0:16].astype(np.float32) / 16
    img = np.clip(np.stack([x, y, x * y], axis=0), 0, 1)
    tr = NTCTrainer(cfg, [img])
    tr.train_many(20)
    p = str(tmp_path / "ntc.ckpt.npz")
    tr.save_checkpoint(p)
    rec_before = np.asarray(tr.decode(0))

    tr2 = NTCTrainer(cfg, [img])
    tr2.load_checkpoint(p)
    assert tr2.state.step == 20 and not tr2.state.frozen
    np.testing.assert_allclose(np.asarray(tr2.decode(0)), rec_before, atol=1e-6)
    # training continues from the restored optimizer state
    tr2.train_many(20)
    assert tr2.state.step == 40


def test_resume_extension_unfreezes(tmp_path):
    """Extending a finished run (post-freeze checkpoint, larger
    NUM_EPOCHS) must unfreeze the grids so the new schedule actually
    trains them; keeping them frozen pins the extended run at the old
    run's quality (round-2 finding: 100k→320k extension stuck at the
    100k PSNR)."""
    import warnings

    import numpy as np

    from nic.config import CompressionConfig
    from nic.train.ntc import NTCTrainer

    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (3, 32, 32)).astype(np.float32)
    base = dict(image_size=32, crop_mip_level=4, num_crops=2, fp_bits=8,
                feature_pyramid_channels=4, pe_channels=4,
                hidden_layer_channels=16, tf_no_mip=True, seed=0)
    # short run that completes its freeze (the boundary step at 95% of
    # 20 epochs runs within 21 steps)
    tr = NTCTrainer(CompressionConfig(num_epochs=20, **base), [img])
    tr.train_many(21)
    assert tr.state.frozen
    ck = str(tmp_path / "ck.npz")
    tr.save_checkpoint(ck)

    # same-protocol resume keeps frozen state
    tr2 = NTCTrainer(CompressionConfig(num_epochs=20, **base), [img])
    tr2.load_checkpoint(ck)
    assert tr2.state.frozen

    # extension resume unfreezes (with a warning)
    tr3 = NTCTrainer(CompressionConfig(num_epochs=200, **base), [img])
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        tr3.load_checkpoint(ck)
    assert not tr3.state.frozen
    assert any("unfreezing" in str(x.message) for x in w)
