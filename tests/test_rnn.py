"""QuantRNN (LSTM/GRU) tests — quant_rnn.py parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorrt_model_optimizer_tpu.models import rnn


@pytest.mark.parametrize("cell", ["lstm", "gru"])
class TestQuantRNN:
    def _setup(self, cell):
        cfg = rnn.RNNConfig.tiny(cell=cell)
        params = rnn.init_params(cfg, jax.random.PRNGKey(0))
        x = jnp.asarray(np.random.default_rng(0).normal(
            size=(2, 12, cfg.input_size)).astype(np.float32))
        return cfg, params, x

    def test_forward_shapes(self, cell):
        cfg, params, x = self._setup(cell)
        out, hT, _ = rnn.forward(cfg, params, x)
        assert out.shape == (2, 12, cfg.hidden_size)
        assert hT.shape == (cfg.num_layers, 2, cfg.hidden_size)
        assert np.isfinite(np.asarray(out)).all()

    def test_state_carries(self, cell):
        """Split-sequence forward with carried state == full forward."""
        cfg, params, x = self._setup(cell)
        full, _, _ = rnn.forward(cfg, params, x)
        if cell == "lstm":
            pytest.skip("cell state not exposed in the public API; GRU covers carry")
        o1, h1, _ = rnn.forward(cfg, params, x[:, :6])
        o2, _, _ = rnn.forward(cfg, params, x[:, 6:], h0=h1)
        np.testing.assert_allclose(np.asarray(o2), np.asarray(full[:, 6:]),
                                   rtol=1e-4, atol=1e-5)

    @pytest.mark.parametrize("preset", ["INT8_DEFAULT_CFG", "FP8_DEFAULT_CFG"])
    def test_quantize_rnn(self, cell, preset):
        cfg, params, x = self._setup(cell)
        layout, qstate = rnn.quantize_rnn(cfg, params, preset, [x])
        assert "layers.0.wx" in qstate and "weight" in qstate["layers.0.wx"]
        ref, _, _ = rnn.forward(cfg, params, x)
        out, _, _ = rnn.forward(cfg, params, x, layout=layout, qstate=qstate)
        corr = np.corrcoef(np.asarray(out).ravel(), np.asarray(ref).ravel())[0, 1]
        assert corr > 0.99, corr

    def test_differentiable(self, cell):
        cfg, params, x = self._setup(cell)

        def loss(p):
            out, _, _ = rnn.forward(cfg, p, x)
            return jnp.mean(out.astype(jnp.float32) ** 2)

        g = jax.grad(loss)(params)
        gn = float(jnp.linalg.norm(g["layers.0.wh"].astype(jnp.float32)))
        assert np.isfinite(gn) and gn > 0
