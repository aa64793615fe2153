"""Recipe loader tests: schema tags, imports, dotlist overrides."""

import pytest

from tensorrt_model_optimizer_tpu.recipes import loader


def test_builtin_recipe():
    r = loader.load_recipe("nvfp4_ptq.yaml")
    assert r.quant.preset == "NVFP4_DEFAULT_CFG"
    assert r.calib.num_batches == 8  # merged from base via imports
    qcfg = r.resolve_quant_config()
    assert qcfg.resolve("x.weight_quantizer").num_bits == (2, 1)


def test_dotlist_overrides():
    r = loader.load_recipe("nvfp4_ptq.yaml", ["calib.num_batches=2", "quant.preset=FP8_DEFAULT_CFG"])
    assert r.calib.num_batches == 2
    assert r.quant.preset == "FP8_DEFAULT_CFG"


def test_local_file_with_import(tmp_path):
    p = tmp_path / "my.yaml"
    p.write_text("""# modelopt-schema: ptq-recipe/v1
imports: [int8_smoothquant.yaml]
export_path: /tmp/x
quant:
  overrides:
    "*mlp*": {enable: false}
""")
    r = loader.load_recipe(str(p))
    assert r.quant.preset == "INT8_SMOOTHQUANT_CFG"  # from builtin import
    assert r.export_path == "/tmp/x"
    qcfg = r.resolve_quant_config()
    assert not qcfg.resolve("a.mlp.up_proj.weight_quantizer").enable


def test_missing_schema_rejected(tmp_path):
    p = tmp_path / "bad.yaml"
    p.write_text("quant: {preset: FP8_DEFAULT_CFG}")
    with pytest.raises(ValueError, match="missing"):
        loader.load_recipe(str(p))
