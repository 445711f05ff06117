"""Factory-config system tests (dogmatic defaults, YAML round-trip)."""

import numpy as np

from tssep_tpu.config import (
    Configurable, dumps_yaml, from_config, get_config, nested_merge,
)


class Leaf(Configurable):
    def __init__(self, a=1, b='x'):
        self.a = a
        self.b = b


class Parent(Configurable):
    @classmethod
    def finalize_dogmatic_config(cls, config):
        config['child'] = {'factory': Leaf, 'a': 10}
        # default derived from the (possibly user-set) child value; read
        # defensively — the user may have swapped the child factory.
        config['derived'] = config['child'].get('a', 0) * 2

    def __init__(self, child, derived=0, name='p'):
        self.child = child
        self.derived = derived
        self.name = name


def test_defaults_filled():
    cfg = Parent.get_config()
    assert cfg['child']['a'] == 10
    assert cfg['child']['b'] == 'x'  # signature default of Leaf
    assert cfg['derived'] == 20
    assert cfg['name'] == 'p'
    p = from_config(cfg)
    assert isinstance(p.child, Leaf)
    assert p.derived == 20


def test_user_wins_over_finalize():
    cfg = Parent.get_config({'child': {'a': 3}, 'name': 'q'})
    assert cfg['child']['a'] == 3
    assert cfg['derived'] == 6  # finalize saw the user value
    assert cfg['name'] == 'q'


def test_factory_override_replaces_kwargs():
    class Leaf2(Configurable):
        def __init__(self, c=5):
            self.c = c

    cfg = Parent.get_config({'child': {'factory': Leaf2}})
    assert cfg['child']['factory'].endswith('Leaf2')
    assert 'a' not in cfg['child']
    assert cfg['child']['c'] == 5


def test_yaml_roundtrip():
    import yaml
    cfg = Parent.get_config({'child': {'a': 7}})
    text = dumps_yaml(cfg)
    cfg2 = yaml.safe_load(text)
    assert cfg2 == cfg
    p = from_config(cfg2)
    assert p.child.a == 7


def test_nested_merge():
    a = {'x': {'y': 1, 'z': 2}, 'w': 3}
    b = {'x': {'y': 10}}
    out = nested_merge(a, b)
    assert out == {'x': {'y': 10, 'z': 2}, 'w': 3}
    assert a['x']['y'] == 1  # no mutation


def test_new_shortcut():
    p = Parent.new({'child': {'a': 4}})
    assert p.child.a == 4
    assert p.derived == 8


def test_get_config_by_string():
    cfg = get_config('tssep_tpu.features.extractor.Log1pMaxNormAbsSTFT',
                     {'size': 64, 'shift': 32})
    fe = from_config(cfg)
    assert fe.size == 64
    assert fe.output_size == 33
    assert fe.window_length == 64  # finalize filled from size
