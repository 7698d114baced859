import pytest

from declip_tpu.config import Cfg, override, parse_config
from declip_tpu.utils.registry import Registry


YAML = """
model:
  type: clip_res50
  kwargs:
    image_encode:
      embed_dim: 1024
lr_scheduler:
  type: Cosine
  kwargs:
    base_lr: 0.0
    warmup_lr: 0.001
"""


def test_parse_and_attr_access():
    cfg = parse_config(YAML)
    assert cfg.model.type == "clip_res50"
    assert cfg.model.kwargs.image_encode.embed_dim == 1024
    assert cfg.get_path("model.kwargs.image_encode.embed_dim") == 1024
    assert cfg.get_path("model.missing.deep", 7) == 7


def test_override_is_copy():
    cfg = parse_config(YAML)
    cfg2 = override(cfg, "lr_scheduler.kwargs.warmup_lr", 0.1)
    assert cfg2.lr_scheduler.kwargs.warmup_lr == 0.1
    assert cfg.lr_scheduler.kwargs.warmup_lr == 0.001


def test_registry_build_and_errors():
    reg = Registry("toy")

    @reg.register
    def widget(a, b=2):
        return (a, b)

    assert reg.build(Cfg({"type": "widget", "kwargs": {"a": 1}})) == (1, 2)
    assert reg.build(Cfg({"type": "widget", "kwargs": {"a": 1}}), b=5) == (1, 5)
    with pytest.raises(KeyError, match="toy registry has no entry"):
        reg.get("nope")
    with pytest.raises(KeyError, match="duplicate"):
        reg.register(lambda: None, name="widget")
