"""Pallas kernel parity vs the XLA sufficient-stats path.

On CPU the kernel runs in interpreter mode (small batches only); the same
comparison runs compiled on real TPU hardware when available (bench path).
"""

import numpy as np
import pytest

from tpumcia.features.pallas_glcm import sufficient_stats_pallas
from tpumcia.features.stats import sufficient_stats


def _assert_stats_equal(a, b):
    for name in a._fields:
        av, bv = getattr(a, name), getattr(b, name)
        if av is None and bv is None:
            continue
        x = np.asarray(av, dtype=np.float64)
        y = np.asarray(bv, dtype=np.float64)
        np.testing.assert_array_equal(x, y, err_msg=name)


def _assert_fast_stats_match(full, fast):
    """The v4 reduced kernel drops diff_hist; every shared field must be
    bit-equal, and dstats must carry exactly the reductions the wire derives
    from the full kernel's difference histogram (homogeneity to f32)."""
    for name in ("hist", "count", "vmax", "marg_l", "marg_r", "glcm_sumsq",
                 "pair_count"):
        np.testing.assert_array_equal(
            np.asarray(getattr(full, name), np.float64),
            np.asarray(getattr(fast, name), np.float64),
            err_msg=name,
        )
    assert fast.diff_hist is None and fast.dstats is not None
    dh = np.asarray(full.diff_hist, np.int64)
    L = full.marg_l.shape[-1]
    d = np.arange(2 * L - 1) - (L - 1)
    d2 = d * d
    ds = np.asarray(fast.dstats, np.float64)
    # the hi/lo limb SPLIT of sum(G*d^2) is an internal encoding (kernel v7
    # emits [T>>8, T&255] of the folded total where the generic path emits
    # per-element plane sums); the contract is the base-256 reassembly the
    # wire performs (hybrid._wire_u32_quads) plus the exact |d| plane
    np.testing.assert_array_equal(
        ds[..., 0] * 256.0 + ds[..., 1], (dh * d2).sum(-1)
    )
    np.testing.assert_array_equal(ds[..., 2], (dh * np.abs(d)).sum(-1))
    homog = (dh / (1.0 + d2)).sum(-1)
    np.testing.assert_allclose(ds[..., 3], homog, rtol=1e-5)


def test_pallas_fast_path_matches_full(small_batch):
    """need_diff_hist=False (kernel v4) vs the full kernel."""
    full = sufficient_stats_pallas(small_batch[:2], interpret=True)
    fast = sufficient_stats_pallas(
        small_batch[:2], interpret=True, need_diff_hist=False
    )
    _assert_fast_stats_match(full, fast)


def test_levels_gt_256_keep_exact_diff_path(monkeypatch):
    """extract_features must not select the reduced dstats contract above
    256 levels: dstats' hi-limb sum(G*(d2>>8)) can exceed 2^24 there
    ((511^2>>8)*65535 ≈ 6.7e7) and f32 silently rounds it — the exact i32
    diff-histogram path stays on for levels > 256."""
    import tpumcia.features.pallas_glcm as pg
    from tpumcia.config import FeatureConfig, GLCMConfig
    from tpumcia.features.extract import extract_features

    seen = {}

    class _Stop(Exception):
        pass

    def capture(images, mask=None, **kw):
        seen[kw["levels"]] = kw["need_diff_hist"]
        raise _Stop()

    monkeypatch.setattr(pg, "sufficient_stats_pallas", capture)
    img = np.zeros((1, 8, 8, 1), np.uint16)
    for levels in (256, 512):
        # precision='device' rides run_stats for any levels (the 256-level
        # hybrid config would take the fused wire branch instead, which is
        # wire-gated to <= 256 levels by hybrid_wire_ok already)
        cfg = FeatureConfig(
            precision="device", use_pallas="always",
            glcm=GLCMConfig(levels=levels),
        )
        with pytest.raises(_Stop):
            extract_features(img, config=cfg)
    assert seen == {256: False, 512: True}, seen


def test_pallas_fast_path_masked(rng):
    img = (rng.random((2, 32, 32, 2)) * 256).astype(np.uint8)
    mask = rng.random((2, 32, 32, 2)) > 0.3
    full = sufficient_stats_pallas(img, mask, interpret=True)
    fast = sufficient_stats_pallas(
        img, mask, interpret=True, need_diff_hist=False
    )
    _assert_fast_stats_match(full, fast)


def test_pallas_fast_path_features_close(small_batch):
    """End-to-end: hybrid finalize over the reduced kernel must reproduce
    the full kernel's features (exactly, except f32-summed homogeneity)."""
    from tpumcia.features.finalize import finalize_features

    full = finalize_features(
        sufficient_stats_pallas(small_batch[:2], interpret=True),
        backend="hybrid",
    )
    fast = finalize_features(
        sufficient_stats_pallas(
            small_batch[:2], interpret=True, need_diff_hist=False
        ),
        backend="hybrid",
    )
    np.testing.assert_allclose(
        np.asarray(full.values), np.asarray(fast.values),
        rtol=1e-5, atol=1e-7,
    )


def test_pallas_fast_path_multi(small_batch):
    from tpumcia.features.pallas_glcm import sufficient_stats_pallas_multi

    full = sufficient_stats_pallas_multi(
        small_batch[:2], offsets=OFFSETS[:2], interpret=True
    )
    fast = sufficient_stats_pallas_multi(
        small_batch[:2], offsets=OFFSETS[:2], interpret=True,
        need_diff_hist=False,
    )
    for f, g in zip(full, fast):
        _assert_fast_stats_match(f, g)


def test_pallas_matches_xla(small_batch):
    ref = sufficient_stats(small_batch[:2])
    got = sufficient_stats_pallas(small_batch[:2], interpret=True)
    _assert_stats_equal(ref, got)


def test_pallas_masked(rng):
    img = (rng.random((2, 32, 32, 2)) * 256).astype(np.uint8)
    mask = rng.random((2, 32, 32, 2)) > 0.3
    ref = sufficient_stats(img, mask)
    got = sufficient_stats_pallas(img, mask, interpret=True)
    _assert_stats_equal(ref, got)


@pytest.mark.slow
def test_pallas_nondefault_offset(rng):
    img = (rng.random((2, 24, 24, 1)) * 256).astype(np.uint8)
    for offset in [(0, 1), (3, 0), (2, 2)]:
        ref = sufficient_stats(img, offset=offset)
        got = sufficient_stats_pallas(img, offset=offset, interpret=True)
        _assert_stats_equal(ref, got)


def test_pallas_degenerate_channels():
    img = np.zeros((1, 16, 16, 2), dtype=np.uint8)
    img[:, :, :, 1] = 4
    ref = sufficient_stats(img)
    got = sufficient_stats_pallas(img, interpret=True)
    _assert_stats_equal(ref, got)


OFFSETS = ((0, 5), (5, 0), (1, 1), (0, 1))


def test_pallas_multi_offset_matches_single(small_batch):
    """The fused multi-offset kernel must equal per-offset single passes."""
    from tpumcia.features.pallas_glcm import sufficient_stats_pallas_multi

    got = sufficient_stats_pallas_multi(
        small_batch[:2], offsets=OFFSETS[:2], interpret=True
    )
    assert len(got) == 2
    for offset, st in zip(OFFSETS, got):
        ref = sufficient_stats(small_batch[:2], offset=offset)
        _assert_stats_equal(ref, st)


@pytest.mark.slow
def test_pallas_multi_offset_matches_single_all(small_batch):
    from tpumcia.features.pallas_glcm import sufficient_stats_pallas_multi

    got = sufficient_stats_pallas_multi(
        small_batch[:2], offsets=OFFSETS, interpret=True
    )
    for offset, st in zip(OFFSETS, got):
        ref = sufficient_stats(small_batch[:2], offset=offset)
        _assert_stats_equal(ref, st)


def test_pallas_multi_offset_masked(rng):
    from tpumcia.features.pallas_glcm import sufficient_stats_pallas_multi

    img = (rng.random((2, 32, 32, 2)) * 256).astype(np.uint8)
    mask = rng.random((2, 32, 32, 2)) > 0.3
    got = sufficient_stats_pallas_multi(
        img, mask, offsets=OFFSETS[:2], interpret=True
    )
    for offset, st in zip(OFFSETS, got):
        ref = sufficient_stats(img, mask, offset=offset)
        _assert_stats_equal(ref, st)


@pytest.mark.tpu
def test_pallas_multi_offset_compiled_on_tpu(small_batch):
    from tpumcia.features.pallas_glcm import sufficient_stats_pallas_multi
    from tpumcia.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    got = sufficient_stats_pallas_multi(small_batch, offsets=OFFSETS[:2])
    for offset, st in zip(OFFSETS, got):
        ref = sufficient_stats(small_batch, offset=offset)
        _assert_stats_equal(ref, st)


@pytest.mark.tpu
def test_pallas_compiled_on_tpu(small_batch):
    from tpumcia.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    ref = sufficient_stats(small_batch)
    got = sufficient_stats_pallas(small_batch)
    _assert_stats_equal(ref, got)


@pytest.mark.tpu
def test_pallas_fast_path_compiled_on_tpu(small_batch):
    """The v4 reduced kernel (wire path) compiled on hardware."""
    from tpumcia.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    full = sufficient_stats_pallas(small_batch)
    fast = sufficient_stats_pallas(small_batch, need_diff_hist=False)
    _assert_fast_stats_match(full, fast)


@pytest.mark.tpu
def test_pallas_masked_compiled_on_tpu(small_batch, rng):
    """The masked kernel specialisation compiled on hardware."""
    from tpumcia.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    mask = rng.random(small_batch.shape) > 0.3
    ref = sufficient_stats(small_batch, mask)
    got = sufficient_stats_pallas(small_batch, mask)
    _assert_stats_equal(ref, got)
    fast = sufficient_stats_pallas(small_batch, mask, need_diff_hist=False)
    _assert_fast_stats_match(ref, fast)


@pytest.mark.tpu
def test_full_pipeline_compiled_on_tpu(small_batch):
    """End-to-end (Pallas stats -> hybrid finalize -> head -> channel
    permutation) compiled on the real chip."""
    import numpy as np

    from tpumcia.config import FeatureConfig, HeadConfig, ImportanceConfig
    from tpumcia.features.extract import extract_features
    from tpumcia.importance.channels import channel_importance
    from tpumcia.models.heads import fit_head
    from tpumcia.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    fm = extract_features(small_batch, config=FeatureConfig(use_pallas="always"))
    X = np.nan_to_num(np.asarray(fm.values, np.float32))
    y = np.arange(len(X)) % 2
    head = fit_head(X, y, config=HeadConfig(kind="logistic", num_steps=50))
    res = channel_importance(
        head, fm, y, method="permutation", config=ImportanceConfig(n_repeats=2)
    )
    assert res.num_channels == 3


@pytest.mark.slow
@pytest.mark.parametrize(
    "env_key, env_val",
    [
        ("TPUMCIA_KERNEL_SHIFT", "copy"),
        ("TPUMCIA_KERNEL_SCHED", "serial"),
        ("TPUMCIA_KERNEL_SCHED", "phased"),
    ],
)
def test_kernel_variant_knobs_bit_identical(env_key, env_val):
    """The kernel restructure knobs (the materialised-copy neighbour
    stream — the fallback for shapes the default in-kernel roll can't
    serve; the pipelined/phased VPU-MXU schedules) must be BIT-identical
    to the default kernel — they are performance restructures, not
    semantic changes. Runs in a subprocess because the knobs are read at
    import."""
    import os
    import subprocess
    import sys

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["TPUMCIA_REEXECED"] = "1"
    env[env_key] = env_val
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    src = r"""
import numpy as np
from tpumcia.features.pallas_glcm import sufficient_stats_pallas
from tpumcia.features.stats import sufficient_stats

rng = np.random.RandomState(0)
imgs = rng.randint(0, 256, size=(2, 64, 64, 3)).astype(np.uint8)
mask = (rng.random((2, 64, 64, 3)) > 0.3).astype(np.uint8)
for m in (None, mask):
    for nd in (True, False):
        got = sufficient_stats_pallas(imgs, m, interpret=True, need_diff_hist=nd)
        ref = sufficient_stats(imgs, m)
        for name in ("hist", "marg_l", "marg_r", "glcm_sumsq", "pair_count", "count"):
            np.testing.assert_array_equal(
                np.asarray(getattr(got, name)), np.asarray(getattr(ref, name)), err_msg=name
            )
        if nd:
            np.testing.assert_array_equal(
                np.asarray(got.diff_hist), np.asarray(ref.diff_hist)
            )

# multi-offset: the GLCM contract (hist is only meaningful on offset 0 —
# intensity rides the first offset, matching the XLA reference)
from tpumcia.features.pallas_glcm import sufficient_stats_pallas_multi
from tpumcia.features.stats import sufficient_stats_multi

imgs2 = rng.randint(0, 256, size=(2, 32, 32, 2)).astype(np.uint8)
OFFS = ((0, 5), (5, 0), (5, 5), (5, -5))
gots = sufficient_stats_pallas_multi(imgs2, None, offsets=OFFS, interpret=True)
refs = sufficient_stats_multi(imgs2, None, offsets=OFFS)
np.testing.assert_array_equal(np.asarray(gots[0].hist), np.asarray(refs[0].hist))
for o, (g, r) in enumerate(zip(gots, refs)):
    for name in ("marg_l", "marg_r", "glcm_sumsq", "pair_count"):
        np.testing.assert_array_equal(
            np.asarray(getattr(g, name)), np.asarray(getattr(r, name)),
            err_msg=f"{o} {name}",
        )
    np.testing.assert_array_equal(np.asarray(g.diff_hist), np.asarray(r.diff_hist))
print("VARIANT_OK")
"""
    proc = subprocess.run(
        [sys.executable, "-c", src], env=env, capture_output=True, text=True,
        timeout=600, cwd=repo,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "VARIANT_OK" in proc.stdout
