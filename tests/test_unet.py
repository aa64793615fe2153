"""UNet (latent diffusion) quantization tests — QuantConv2d parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorrt_model_optimizer_tpu.models import unet


@pytest.fixture(scope="module")
def tiny_unet():
    cfg = unet.UNetConfig.tiny()
    params = unet.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 4)).astype(np.float32))
    t = jnp.asarray([10, 500])
    return cfg, params, x, t


class TestUNet:
    def test_forward_shape(self, tiny_unet):
        cfg, params, x, t = tiny_unet
        eps, _ = unet.forward(cfg, params, x, t)
        assert eps.shape == x.shape
        assert np.isfinite(np.asarray(eps)).all()

    def test_timestep_matters(self, tiny_unet):
        cfg, params, x, t = tiny_unet
        # conv_out is zero-init; nudge it so outputs are nonzero
        p = dict(params)
        p["conv_out"] = jax.random.normal(jax.random.PRNGKey(9), p["conv_out"].shape,
                                          jnp.float32) * 0.1
        e1, _ = unet.forward(cfg, p, x, jnp.asarray([0, 0]))
        e2, _ = unet.forward(cfg, p, x, jnp.asarray([900, 900]))
        assert float(jnp.abs(e1 - e2).max()) > 1e-6

    @pytest.mark.parametrize("preset", ["INT8_DEFAULT_CFG", "FP8_DEFAULT_CFG",
                                        "NVFP4_DEFAULT_CFG"])
    def test_quantize_unet(self, tiny_unet, preset):
        cfg, params, x, t = tiny_unet
        p = dict(params)
        p["conv_out"] = jax.random.normal(jax.random.PRNGKey(9), p["conv_out"].shape,
                                          jnp.float32) * 0.1
        layout, qstate = unet.quantize_unet(cfg, p, preset, [(x, t)])
        assert "conv_in" in qstate and "weight" in qstate["conv_in"]
        ref, _ = unet.forward(cfg, p, x, t)
        out, _ = unet.forward(cfg, p, x, t, layout=layout, qstate=qstate)
        rel = float(jnp.abs(out - ref).mean() / (jnp.abs(ref).mean() + 1e-9))
        assert rel < 0.5, rel
        corr = np.corrcoef(np.asarray(out).ravel(), np.asarray(ref).ravel())[0, 1]
        # NVFP4 is W4A4 — random-init convs see real quant noise
        assert corr > (0.9 if "NVFP4" in preset else 0.95), corr

    def test_conv_per_channel_amax_shape(self, tiny_unet):
        cfg, params, x, t = tiny_unet
        layout, qstate = unet.quantize_unet(cfg, params, "INT8_DEFAULT_CFG", [(x, t)])
        w = params["conv_in"]
        amax = qstate["conv_in"]["weight"].amax
        # per-output-channel over the flattened [O, I*kh*kw] view
        assert amax.shape[0] == w.shape[0]

    def test_ddim_sampling_smoke(self, tiny_unet):
        """Few-step sampler runs through the quantized UNet (fastgen-style)."""
        cfg, params, x, t = tiny_unet
        layout, qstate = unet.quantize_unet(cfg, params, "FP8_DEFAULT_CFG", [(x, t)])

        def denoise_step(h, i):
            eps, _ = unet.forward(cfg, params, h, jnp.full((h.shape[0],), i),
                                  layout=layout, qstate=qstate)
            return h - 0.1 * eps, None

        out, _ = jax.lax.scan(denoise_step, x, jnp.asarray([900, 600, 300, 0]))
        assert np.isfinite(np.asarray(out)).all()
