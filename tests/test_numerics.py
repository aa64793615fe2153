"""Golden tests for the quant numerics layer.

Mirrors the reference's `tests/unit/torch/quantization/test_tensor_quant.py`
coverage: every format's rounding contract on tiny tensors, STE gradients,
pack/unpack roundtrips.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorrt_model_optimizer_tpu.ops import formats, numerics, ste


class TestFpRound:
    def test_e2m1_reference_boundaries(self):
        # `nvfp4_quant.py:18-49` decision boundaries
        probe = np.array([0.24, 0.25, 0.26, 0.74, 0.75, 0.76, 1.24, 1.25, 1.26,
                          1.74, 1.75, 1.76, 2.4, 2.5, 2.6, 3.4, 3.5, 3.6,
                          4.9, 5.0, 5.1, 7.0])
        exp = np.array([0, 0, .5, .5, 1, 1, 1, 1, 1.5, 1.5, 2, 2, 2, 2, 3, 3,
                        4, 4, 4, 4, 6, 6])
        got = np.asarray(numerics.fp4_round(jnp.asarray(probe)))
        np.testing.assert_allclose(got, exp)
        got_neg = np.asarray(numerics.fp4_round(jnp.asarray(-probe)))
        np.testing.assert_allclose(got_neg, -exp)

    def test_fp_round_matches_native_e4m3(self):
        rng = np.random.default_rng(0)
        x = rng.normal(scale=100, size=(1024,)).astype(np.float32)
        ours = np.asarray(numerics.fp_round(jnp.asarray(x), 4, 3))
        native = np.asarray(numerics.cast_e4m3(jnp.asarray(x)))
        np.testing.assert_allclose(ours, native)

    def test_fp_round_matches_native_e5m2(self):
        rng = np.random.default_rng(1)
        x = rng.normal(scale=1e4, size=(1024,)).astype(np.float32)
        ours = np.asarray(numerics.fp_round(jnp.asarray(x), 5, 2))
        native = np.asarray(numerics.cast_e5m2(jnp.asarray(x)))
        np.testing.assert_allclose(ours, native)

    def test_fp_round_e2m1_matches_boundary_impl(self):
        rng = np.random.default_rng(2)
        x = rng.uniform(-8, 8, size=(4096,)).astype(np.float32)
        generic = np.asarray(numerics.fp_round(jnp.asarray(x), 2, 1))
        boundary = np.asarray(numerics.fp4_round(jnp.asarray(x)))
        np.testing.assert_allclose(generic, boundary)

    def test_max_representable(self):
        assert formats.fp_max_representable(4, 3) == 448.0
        assert formats.fp_max_representable(5, 2) == 57344.0
        assert formats.fp_max_representable(2, 1) == 6.0
        assert formats.fp_max_representable(3, 2) == 28.0
        assert formats.fp_max_representable(2, 3) == 7.5
        assert formats.fp_emax(2, 1) == 2
        assert formats.fp_emax(4, 3) == 8

    def test_subnormal_rounding(self):
        # E4M3 min subnormal = 2^-9; values below half of it round to 0
        tiny = 2.0 ** -9
        x = jnp.array([tiny, tiny / 2 * 0.99, tiny * 1.4, tiny * 1.6])
        got = np.asarray(numerics.fp_round(x, 4, 3))
        np.testing.assert_allclose(got, [tiny, 0.0, tiny, 2 * tiny])


class TestIntQuant:
    def test_per_tensor_int8(self):
        x = jnp.array([-2.0, -1.0, -0.004, 0.0, 0.004, 1.0, 2.0])
        amax = jnp.array(2.0)
        y = np.asarray(numerics.fake_quant_int(x, amax, 8))
        scale = 2.0 / 127
        exp = np.round(np.asarray(x) / scale).clip(-128, 127) * scale
        np.testing.assert_allclose(y, exp, rtol=1e-6)

    def test_per_channel(self):
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.normal(size=(4, 64)).astype(np.float32))
        amax = jnp.max(jnp.abs(x), axis=1, keepdims=True)
        y = np.asarray(numerics.fake_quant_int(x, amax, 8))
        err = np.abs(y - np.asarray(x))
        assert err.max() <= np.asarray(amax).max() / 127 * 0.5 + 1e-7

    def test_int4_block(self):
        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.normal(size=(8, 128)).astype(np.float32))
        amax = numerics.block_reduce_amax(x, ((-1, 32),))
        y = np.asarray(numerics.fake_quant_int(x, amax, 4))
        # INT4 grid: max error <= amax/7 * 0.5 per block
        assert np.abs(y - np.asarray(x)).max() <= np.asarray(amax).max() / 7 * 0.5 + 1e-7

    def test_zero_amax_guard(self):
        x = jnp.zeros((4,))
        y = numerics.fake_quant_int(x, jnp.array(0.0), 8)
        assert np.all(np.isfinite(np.asarray(y)))

    def test_unsigned(self):
        x = jnp.array([0.0, 0.4, 1.0])
        y = np.asarray(numerics.fake_quant_int(x, jnp.array(1.0), 8, unsigned=True))
        np.testing.assert_allclose(y, np.array([0, 102, 255]) / 255, rtol=1e-6)

    def test_real_quant_int8_roundtrip(self):
        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.normal(size=(16, 32)).astype(np.float32))
        amax = jnp.max(jnp.abs(x))
        q, scale = numerics.real_quant_int(x, amax, 8)
        y = np.asarray(q, dtype=np.float32) * np.asarray(scale)
        fake = np.asarray(numerics.fake_quant_int(x, amax, 8))
        np.testing.assert_allclose(y, fake, rtol=1e-6)


class TestFpQuant:
    def test_scaled_e4m3(self):
        rng = np.random.default_rng(6)
        x = jnp.asarray(rng.normal(size=(256,)).astype(np.float32))
        amax = jnp.max(jnp.abs(x))
        y = np.asarray(numerics.fake_quant_fp(x, amax, 4, 3))
        # amax maps to 448: relative grid error bounded by E4M3 eps (2^-3)
        assert np.abs(y - np.asarray(x)).max() <= float(amax) / 448 * 32  # loose
        # idempotent
        y2 = np.asarray(numerics.fake_quant_fp(jnp.asarray(y), amax, 4, 3))
        np.testing.assert_allclose(y, y2)

    def test_unscaled_cast_mode(self):
        x = jnp.array([500.0, -500.0, 1.23])
        y = np.asarray(numerics.fake_quant_fp(x, None, 4, 3))
        assert y[0] == 448.0 and y[1] == -448.0


class TestNVFP4:
    def test_two_level_scale(self):
        bam = jnp.array([6.0 * 448.0])
        gs = numerics.nvfp4_global_scale(jnp.array(6.0 * 448.0))
        assert float(gs) == 1.0
        sb = numerics.nvfp4_block_scale(bam, gs)
        np.testing.assert_allclose(np.asarray(sb), [448.0])

    def test_fake_quant_idempotent(self):
        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.normal(size=(4, 64)).astype(np.float32))
        y = numerics.fake_quant_nvfp4(x, 16)
        y2 = numerics.fake_quant_nvfp4(y, 16, global_amax=jnp.max(jnp.abs(x)))
        # Re-quantizing with same global amax changes little
        np.testing.assert_allclose(np.asarray(y), np.asarray(y2), atol=1e-5)

    def test_block_max_exactly_representable(self):
        # Block max maps to ±6 * s_b and roundtrips through fake quant
        x = np.zeros((1, 16), np.float32)
        x[0, 0] = 3.0
        x[0, 5] = -1.5
        y = np.asarray(numerics.fake_quant_nvfp4(jnp.asarray(x), 16))
        assert y[0, 0] == pytest.approx(3.0, rel=1e-2)

    def test_real_quant_roundtrip(self):
        rng = np.random.default_rng(8)
        x = jnp.asarray(rng.normal(size=(8, 64)).astype(np.float32))
        packed, scode, gs = numerics.real_quant_nvfp4(x, 16)
        assert packed.shape == (8, 32) and packed.dtype == jnp.uint8
        assert scode.shape == (8, 4)
        # dequantize: codes -> values * block scale
        codes = numerics.unpack_nibbles(packed)
        vals = numerics.codes_to_fp4(codes)
        s_e4m3 = scode.astype(jnp.float32)
        sb = numerics.expand_block_scale(s_e4m3 * gs, x.shape, ((1, 16),))
        deq = np.asarray(vals * sb)
        fake = np.asarray(numerics.fake_quant_nvfp4(x, 16))
        np.testing.assert_allclose(deq, fake, rtol=1e-5, atol=1e-6)


class TestMX:
    @pytest.mark.parametrize("em", [(2, 1), (3, 2), (2, 3), (4, 3), (5, 2)])
    def test_mx_formats(self, em):
        rng = np.random.default_rng(9)
        x = jnp.asarray(rng.normal(size=(4, 64)).astype(np.float32))
        y = numerics.fake_quant_mx(x, *em, block_size=32)
        assert np.all(np.isfinite(np.asarray(y)))
        # power-of-two scales: block max / scale must be <= max representable
        bam = numerics.block_amax_compact(jnp.abs(x), ((-1, 32),))
        scale = numerics.e8m0_scale(bam, formats.fp_emax(*em))
        ratio = np.asarray(bam / scale)
        assert ratio.max() <= 2 * formats.fp_max_representable(*em)

    def test_e8m0_power_of_two(self):
        s = np.asarray(numerics.e8m0_scale(jnp.array([0.7, 1.0, 3.0, 100.0]), 0))
        exp = np.log2(s)
        np.testing.assert_allclose(exp, np.round(exp))


class TestNF4:
    def test_fake_quant_maps_to_table(self):
        rng = np.random.default_rng(10)
        x = jnp.asarray(rng.normal(size=(2, 64)).astype(np.float32))
        y = np.asarray(numerics.fake_quant_nf4(x, 64))
        bam = np.max(np.abs(np.asarray(x)), axis=-1, keepdims=True)
        normalized = y / bam
        table = np.array(numerics.NF4_TABLE)
        d = np.min(np.abs(normalized[..., None] - table), axis=-1)
        assert d.max() < 1e-6


class TestPacking:
    def test_int4_roundtrip(self):
        q = jnp.asarray(np.arange(-8, 8, dtype=np.int8).reshape(2, 8))
        packed = numerics.pack_int4(q)
        assert packed.shape == (2, 4)
        got = np.asarray(numerics.unpack_int4(packed))
        np.testing.assert_array_equal(got, np.asarray(q))

    def test_fp4_codes_roundtrip(self):
        vals = jnp.asarray([0.0, 0.5, 1.0, 1.5, 2.0, 3.0, 4.0, 6.0, -0.5, -6.0])
        codes = numerics.fp4_to_codes(vals)
        back = np.asarray(numerics.codes_to_fp4(codes))
        np.testing.assert_allclose(back, np.asarray(vals))


class TestSTE:
    def test_int_ste_grad_clips_outside_amax(self):
        x = jnp.array([-3.0, -0.5, 0.5, 3.0])
        amax = jnp.array(1.0)
        g = jax.grad(lambda t: jnp.sum(ste.fake_quant_int_ste(t, amax, 8)))(x)
        np.testing.assert_allclose(np.asarray(g), [0.0, 1.0, 1.0, 0.0])

    def test_fp_ste_grad(self):
        x = jnp.array([-3.0, 0.5, 3.0])
        amax = jnp.array(1.0)
        g = jax.grad(lambda t: jnp.sum(ste.fake_quant_fp_ste(t, amax, 4, 3)))(x)
        np.testing.assert_allclose(np.asarray(g), [0.0, 1.0, 0.0])

    def test_nvfp4_ste_identity(self):
        x = jnp.asarray(np.random.default_rng(11).normal(size=(2, 32)).astype(np.float32))
        g = jax.grad(lambda t: jnp.sum(ste.fake_quant_nvfp4_ste(t)))(x)
        np.testing.assert_allclose(np.asarray(g), np.ones_like(np.asarray(x)))

    def test_jit_compatible(self):
        f = jax.jit(lambda x, a: ste.fake_quant_int_ste(x, a, 8))
        y = f(jnp.ones((8, 8)), jnp.array(1.0))
        assert y.shape == (8, 8)


class TestBlockHelpers:
    def test_block_reduce_amax_2d(self):
        x = jnp.asarray(np.arange(32, dtype=np.float32).reshape(4, 8))
        amax = np.asarray(numerics.block_reduce_amax(x, ((-1, 4),)))
        assert amax.shape == (4, 8)
        np.testing.assert_allclose(amax[0, :4], 3.0)
        np.testing.assert_allclose(amax[0, 4:], 7.0)

    def test_compact_and_expand(self):
        x = jnp.asarray(np.random.default_rng(12).normal(size=(6, 32)).astype(np.float32))
        c = numerics.block_amax_compact(x, ((0, 2), (1, 16)))
        assert c.shape == (3, 2)
        full = numerics.expand_block_scale(c, x.shape, ((0, 2), (1, 16)))
        np.testing.assert_allclose(np.asarray(full), np.asarray(numerics.block_reduce_amax(x, ((0, 2), (1, 16)))))
