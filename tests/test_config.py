import textwrap

import pytest

from mebt_tpu.config import (
    Config,
    from_dotlist,
    instantiate_from_config,
    load_configs,
    merge,
)


def test_attribute_access_and_nesting():
    c = Config({"a": {"b": 1}, "l": [1, {"x": 2}]})
    assert c.a.b == 1
    assert c.l[1].x == 2
    c.a.c = "hi"
    assert c["a"]["c"] == "hi"


def test_merge_deep_and_list_replace():
    a = Config({"m": {"x": 1, "y": 2}, "l": [1, 2]})
    b = Config({"m": {"y": 3}, "l": [9]})
    c = merge(a, b)
    assert c.m.x == 1 and c.m.y == 3
    assert c.l == [9]


def test_dotlist_types():
    c = from_dotlist(["a.b=1", "a.c=1.5e-3", "d=True", "e=hello", "f=[1,2]"])
    assert c.a.b == 1 and isinstance(c.a.b, int)
    assert abs(c.a.c - 1.5e-3) < 1e-12
    assert c.d is True
    assert c.e == "hello"
    assert c.f == [1, 2]


def test_load_reference_style_yaml(tmp_path):
    y = tmp_path / "m.yaml"
    y.write_text(
        textwrap.dedent(
            """
            model:
                target: mebt.transformer.Net2NetTransformer
                params:
                    vocab_size: 16384
                mask:
                    target: mebt.mask_sampler.MaskGen
                    params:
                        schedule: linear
                        shape: [4, 16, 16]
                        budget: 1024
            exp:
                exact_lr: 1.08e-5
            """
        )
    )
    cfg = load_configs([str(y)], ["model.params.vocab_size=32"])
    assert cfg.model.params.vocab_size == 32
    assert cfg.exp.exact_lr == pytest.approx(1.08e-5)
    mask = instantiate_from_config(cfg.model.mask)
    assert mask.seq_len == 1024
    assert mask.schedule == "linear"


def test_package_toplevel_api():
    """The lazy top-level exports resolve (a framework user's import
    surface: `from mebt_tpu import MeBT, MeBTTrainer, ...`)."""
    import mebt_tpu

    for name in mebt_tpu.__all__:
        assert getattr(mebt_tpu, name) is not None, name
