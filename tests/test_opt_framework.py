"""Hparam / SearchSpace / searcher engine tests."""

import numpy as np
import pytest

from tensorrt_model_optimizer_tpu.opt import hparam, searcher


def test_hparam_basics():
    h = hparam.Hparam("ffn", choices=(64, 96, 128))
    assert h.active == 128 and h.is_configurable
    h2 = h.set_active(64)
    assert h2.active == 64 and h.active == 128  # immutable
    with pytest.raises(ValueError):
        h.set_active(100)


def test_importance_ordering():
    h = hparam.Hparam("ch", choices=(2, 4), importance=[0.1, 0.9, 0.5, 0.7])
    assert h.top_slots(2) == [1, 3]


def test_search_space():
    sp = hparam.SearchSpace({
        "a": hparam.Hparam("a", (1, 2)),
        "b": hparam.Hparam("b", ("x", "y", "z")),
    })
    assert sp.size() == 6
    cfg = sp.set_config({"a": 1, "b": "y"}).config()
    assert cfg == {"a": 1, "b": "y"}


def test_binary_search():
    best = searcher.binary_search(0, 100, lambda x: x <= 37.3, steps=20)
    assert abs(best - 37.3) < 0.1


def test_evolutionary_search():
    target = {"a": 3, "b": 7}

    def sample(rng):
        return {"a": int(rng.integers(0, 10)), "b": int(rng.integers(0, 10))}

    def mutate(c, rng):
        k = "a" if rng.random() < 0.5 else "b"
        c[k] = int(rng.integers(0, 10))
        return c

    st = searcher.evolutionary_search(
        sample, mutate,
        score=lambda c: abs(c["a"] - target["a"]) + abs(c["b"] - target["b"]),
        satisfies=lambda c: True,
        iterations=200, population=8,
    )
    assert st.best_score <= 1


def test_search_state_checkpoint(tmp_path):
    st = searcher.SearchState(best_config={"x": 1}, best_score=0.5)
    p = str(tmp_path / "s.json")
    st.save(p)
    st2 = searcher.SearchState.load(p)
    assert st2.best_config == {"x": 1} and st2.best_score == 0.5


def test_dependency_groups_consistent():
    import jax

    from tensorrt_model_optimizer_tpu.models import llama
    from tensorrt_model_optimizer_tpu.opt import dependency

    cfg = llama.LlamaConfig.tiny()
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    assert dependency.validate_groups(params, cfg) == []


def test_dependency_detects_mismatch():
    import jax
    import jax.numpy as jnp

    from tensorrt_model_optimizer_tpu.models import llama
    from tensorrt_model_optimizer_tpu.opt import dependency

    cfg = llama.LlamaConfig.tiny()
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    # corrupt one tied dimension
    params["layers"]["mlp.up_proj"] = params["layers"]["mlp.up_proj"][:, :, :32]
    probs = dependency.validate_groups(params, cfg)
    assert any("mlp.up_proj" in p for p in probs)


def test_model_registry():
    from tensorrt_model_optimizer_tpu.models import registry

    assert set(registry.families()) >= {"llama", "mixtral", "dit"}
    fam = registry.for_hf_model_type("qwen2")
    assert fam.name == "llama"
    with pytest.raises(KeyError):
        registry.get("nope")
    # custom registration end-to-end
    from tensorrt_model_optimizer_tpu.models import llama as lm

    registry.register(registry.ModelFamily(
        name="my_llama", config_cls=lm.LlamaConfig,
        init_params=lm.init_params, forward=lm.forward,
        build_layout=lm.build_layout, init_quant_state=lm.init_quant_state,
        hf_model_types=("my_llama",),
    ))
    assert registry.for_hf_model_type("my_llama").name == "my_llama"


def test_make_mesh():
    from tensorrt_model_optimizer_tpu.parallel import mesh as mesh_mod

    m = mesh_mod.make_mesh(data=2, tensor=4)
    assert m.shape["data"] == 2 and m.shape["tensor"] == 4
    assert m.shape["pipe"] == 1
    with pytest.raises(ValueError):
        mesh_mod.make_mesh(data=3)
