"""Native C++ packing extension: parity with the jnp numerics."""

import jax.numpy as jnp
import numpy as np
import pytest

from tensorrt_model_optimizer_tpu import csrc


@pytest.fixture(scope="module")
def lib_ok():
    if not csrc.available():
        pytest.skip("native toolchain unavailable")


def test_int4_pack_parity(lib_ok):
    import jax.numpy as jnp

    from tensorrt_model_optimizer_tpu.ops import numerics

    rng = np.random.default_rng(0)
    w = rng.normal(size=(16, 256)).astype(np.float32)
    block = 64
    bam = np.abs(w).reshape(16, -1, block).max(-1)
    scale = np.where(bam == 0, 1.0, bam / 7.0).astype(np.float32)
    packed = csrc.int4_round_and_pack(w, scale, block)
    # reference: jnp path
    s_full = np.repeat(scale, block, axis=1)
    q = np.clip(np.round(w / s_full), -8, 7).astype(np.int8)
    ref = np.asarray(numerics.pack_int4(jnp.asarray(q)))
    np.testing.assert_array_equal(packed, ref)
    # unpack roundtrip
    back = csrc.int4_unpack(packed)
    np.testing.assert_array_equal(back, q)


def test_nvfp4_pack_parity(lib_ok):
    import jax.numpy as jnp

    from tensorrt_model_optimizer_tpu.ops import numerics

    rng = np.random.default_rng(1)
    w = rng.normal(size=(8, 64)).astype(np.float32)
    g_amax = float(np.abs(w).max())
    gs = g_amax / (6.0 * 448.0)
    packed, scales = csrc.nvfp4_quantize_and_pack(w, gs, 16)
    ref_packed, ref_scode, ref_gs = numerics.real_quant_nvfp4(
        jnp.asarray(w), 16, jnp.asarray(g_amax)
    )
    np.testing.assert_allclose(float(ref_gs), gs, rtol=1e-6)
    np.testing.assert_allclose(
        scales, np.asarray(ref_scode.astype(jnp.float32)), rtol=1e-6
    )
    # NOTE: jnp path packs plane-split order in compress.py but
    # real_quant_nvfp4 packs adjacent — both adjacent here
    np.testing.assert_array_equal(packed, np.asarray(ref_packed))


def test_speed_smoke(lib_ok):
    import time

    rng = np.random.default_rng(2)
    w = rng.normal(size=(4096, 4096)).astype(np.float32)
    gs = float(np.abs(w).max()) / (6 * 448)
    t0 = time.time()
    csrc.nvfp4_quantize_and_pack(w, gs, 16)
    dt = time.time() - t0
    assert dt < 5.0  # 16M elements well under 5s in native code


@pytest.mark.skipif(not csrc.available(), reason="native ext unavailable")
def test_nf4_native_matches_jax():
    """Native NF4 pack/dequant == the jax NF4 fake-quant numerics."""
    from tensorrt_model_optimizer_tpu.ops import numerics

    rng = np.random.default_rng(0)
    w = rng.normal(size=(4, 128)).astype(np.float32)
    packed, am = csrc.nf4_quantize_and_pack(w, block=64)
    deq = csrc.nf4_dequantize(packed, am, block=64).reshape(w.shape)
    ref = np.asarray(numerics.fake_quant_nf4(jnp.asarray(w), 64))
    np.testing.assert_allclose(deq, ref, rtol=1e-6, atol=1e-6)
