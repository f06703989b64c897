"""Fused upsample+argmin Pallas kernel vs the XLA chunked scan.

The kernel runs in interpreter mode here (CPU mesh); on TPU the same
program lowers through Mosaic.  The scan (`_upsampled_argmin_scan`) is
the numerical reference — itself golden-tested against
``argmin(resize_bilinear(...))`` in tests/test_eval_stats.py.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from adlm_tpu.interpret.evaluate import _upsampled_argmin_scan
from adlm_tpu.ops.resize import resize_bilinear
from adlm_tpu.ops.upsample_argmin import upsampled_argmin_pallas


@pytest.mark.parametrize("shape,size", [
    ((2, 9, 13, 7), (33, 47)),     # ragged everything
    ((1, 5, 5, 3), (10, 10)),      # integer scale (kernel still exact)
    ((2, 17, 33, 21), (129, 257)), # flagship-like 2^n+1 grids
    ((1, 9, 9, 40), (65, 65)),     # P > chunk: multi-chunk scan
])
def test_pallas_kernel_matches_resize_argmin(shape, size):
    rng = np.random.RandomState(hash(shape) % (2**31))
    d = jnp.asarray(rng.rand(*shape).astype(np.float32))
    want = np.asarray(jnp.argmin(resize_bilinear(d, size), axis=-1))
    got = np.asarray(upsampled_argmin_pallas(
        d, size, th=16, tw=128, c=8, interpret=True))
    np.testing.assert_array_equal(got, want)
    # and the XLA scan agrees (shared semantics across platforms)
    scan = np.asarray(_upsampled_argmin_scan(d, size, chunk=4))
    np.testing.assert_array_equal(scan, want)


def test_pallas_kernel_first_occurrence_tie_break():
    # identical maps for every prototype → strict-< running update must
    # keep index 0 everywhere (numpy/torch argmin semantics)
    d = jnp.asarray(np.ones((1, 4, 4, 5), np.float32))
    got = np.asarray(upsampled_argmin_pallas(
        d, (8, 8), th=8, tw=128, c=4, interpret=True))
    assert (got == 0).all()


def test_pallas_kernel_bf16_inputs():
    rng = np.random.RandomState(3)
    d32 = rng.rand(1, 9, 13, 17).astype(np.float32)
    d = jnp.asarray(d32).astype(jnp.bfloat16)
    got = np.asarray(upsampled_argmin_pallas(
        d, (33, 47), th=16, tw=128, c=8, interpret=True))
    # bf16 maps, f32 accumulation: compare against the bf16-input
    # resize reference
    want = np.asarray(jnp.argmin(
        resize_bilinear(d.astype(jnp.float32), (33, 47)), axis=-1))
    assert (got == want).mean() > 0.99  # bf16 rounding may flip rare ties


def test_tile_plan_keeps_lane_dim_128_aligned():
    """The VMEM-fit shrink must keep TW a multiple of 128: a
    non-128-multiple lane dimension in the block specs fails Mosaic
    lowering on real hardware (e.g. W≈300 starts at TW=384 and must
    step to 256, not 192)."""
    from adlm_tpu.ops.upsample_argmin import _plan_tiles

    for H, W in ((2048, 300), (1366, 384), (4096, 130), (1024, 2048),
                 (8, 8), (513, 513)):
        TH, TW, C, Hp, hp, wp = _plan_tiles(H, W, 129, 257, 4,
                                            th=128, tw=512, c=8)
        assert TW % 128 == 0 and TW >= 128, (H, W, TW)
        assert Hp % TH == 0
        # the strip scratches actually fit (or TW bottomed out at 128)
        assert Hp * TW * 8 <= 4 * 1024 * 1024 or TW == 128, (H, W, TW)
        assert C >= 1


def test_exact_flag_matches_f32_cast_without_materializing():
    """`exact=True` on bf16 maps must be bit-equal to running the f32
    path on a pre-cast copy — for BOTH implementations (the kernel
    casts per VMEM block, the scan per prototype chunk), so the 403 MB
    full-map f32 copy the old stats_exact materialized is never needed.
    Uses sub-bf16-ulp prototype pairs so the exact/fast paths provably
    differ (same construction as test_stats_exact_restores_f32_tap_parity)."""
    rng = np.random.RandomState(11)
    base = rng.rand(2, 6, 8, 1).astype(np.float32)
    d = np.concatenate([base, base - 2e-4,
                        rng.rand(2, 6, 8, 6).astype(np.float32) + 1.0],
                       axis=-1)
    d16 = jnp.asarray(d, jnp.bfloat16)
    size = (17, 23)
    want = np.asarray(_upsampled_argmin_scan(
        d16.astype(jnp.float32), size, chunk=3))

    scan_exact = np.asarray(_upsampled_argmin_scan(
        d16, size, chunk=3, exact=True))
    np.testing.assert_array_equal(scan_exact, want)

    kernel_exact = np.asarray(upsampled_argmin_pallas(
        d16, size, th=8, tw=128, c=3, interpret=True, exact=True))
    np.testing.assert_array_equal(kernel_exact, want)

    # the flag is the thing that matters: the fast bf16 paths flip
    # some engineered near-ties
    assert (np.asarray(_upsampled_argmin_scan(d16, size, chunk=3))
            != want).any()
