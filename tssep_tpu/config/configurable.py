"""Factory-config system: nested ``{'factory': 'dotted.path', **kwargs}`` configs.

Re-implements, TPU-framework-native, the configuration semantics the reference
gets from padertorch's ``Configurable`` (used at e.g. reference
``tssep/train/experiment.py:19``, ``tssep/train/model.py:71``):

- ``get_config(updates)``: produce the *complete* config for a class by layering
  (1) user-provided values (highest priority, immutable),
  (2) values written by ``finalize_dogmatic_config`` (first-write-wins),
  (3) ``__init__`` signature defaults (fallback),
  then recursing into nested factory configs.
- ``from_config(config)``: recursively instantiate.
- YAML round-trip with factories serialized as dotted import paths.

The "dogmatic" contract: a value the user set can never be overwritten by a
default; parents may impose consistent defaults on children (e.g. the feature
extractor's output size becoming the mask estimator's input dim, mirroring
reference ``tssep/train/model.py:133-146``).
"""

from __future__ import annotations

import dataclasses
import importlib
import inspect
from pathlib import Path

import yaml

__all__ = [
    'Configurable',
    'import_class',
    'class_to_str',
    'get_config',
    'from_config',
    'load_yaml',
    'dump_yaml',
    'dumps_yaml',
    'NestedView',
    'nested_merge',
    'nested_get',
    'nested_set',
]


# ---------------------------------------------------------------------------
# Import helpers
# ---------------------------------------------------------------------------

#: Optional alias table so configs written for other frameworks (e.g. the
#: torch reference's ``tssep.train.*`` paths) resolve to our classes.
FACTORY_ALIASES: dict[str, str] = {}


def register_alias(alias: str, target: str):
    FACTORY_ALIASES[alias] = target


def import_class(path):
    """Import a class/function from a dotted path string."""
    if not isinstance(path, str):
        return path
    path = FACTORY_ALIASES.get(path, path)
    module_name, _, cls_name = path.rpartition('.')
    if not module_name:
        raise ImportError(f'Cannot import {path!r}: no module part')
    module = importlib.import_module(module_name)
    try:
        return getattr(module, cls_name)
    except AttributeError:
        raise ImportError(f'Module {module_name!r} has no attribute {cls_name!r}')


def class_to_str(cls):
    if isinstance(cls, str):
        return cls
    return f'{cls.__module__}.{cls.__qualname__}'


def is_factory_config(obj):
    return isinstance(obj, dict) and 'factory' in obj


# ---------------------------------------------------------------------------
# Nested dict helpers
# ---------------------------------------------------------------------------

def nested_merge(base: dict, update: dict) -> dict:
    """Return a new dict: ``update`` layered over ``base`` (update wins).

    If both provide a dict for a key, merge recursively — unless the update
    changes the factory, in which case the update's sub-dict replaces the
    base's entirely (kwargs of a different factory don't mix).
    """
    out = dict(base)
    for k, v in update.items():
        if (
            k in out
            and isinstance(out[k], dict)
            and isinstance(v, dict)
        ):
            if (
                'factory' in v
                and 'factory' in out[k]
                and class_to_str(v['factory']) != class_to_str(out[k]['factory'])
            ):
                out[k] = _copy_nested(v)
            else:
                out[k] = nested_merge(out[k], v)
        else:
            out[k] = _copy_nested(v)
    return out


def _copy_nested(v):
    if isinstance(v, dict):
        return {k: _copy_nested(x) for k, x in v.items()}
    if isinstance(v, list):
        return [_copy_nested(x) for x in v]
    return v


def nested_get(d, dotted_key, default=KeyError):
    keys = dotted_key.split('.') if isinstance(dotted_key, str) else dotted_key
    for k in keys:
        try:
            d = d[k]
        except (KeyError, TypeError):
            if default is KeyError:
                raise KeyError(dotted_key)
            return default
    return d


def nested_set(d, dotted_key, value):
    keys = dotted_key.split('.') if isinstance(dotted_key, str) else dotted_key
    for k in keys[:-1]:
        d = d.setdefault(k, {})
    d[keys[-1]] = value


class NestedView:
    """Flat dotted-key view over a nested dict (read/write)."""

    def __init__(self, data):
        self.data = data

    def __getitem__(self, key):
        return nested_get(self.data, key)

    def __setitem__(self, key, value):
        nested_set(self.data, key, value)

    def __contains__(self, key):
        try:
            nested_get(self.data, key)
            return True
        except KeyError:
            return False


# ---------------------------------------------------------------------------
# Dogmatic layered dict
# ---------------------------------------------------------------------------

class DogmaticView:
    """Layered mapping view used inside ``finalize_dogmatic_config``.

    Priorities (read): user > finalize-writes > signature fallback.
    Writes go to the finalize layer; a key already visible (user layer or an
    earlier finalize write) is NOT overwritten — except dict-valued writes,
    which merge recursively (filling only missing sub-keys).
    """

    def __init__(self, user: dict, defaults: dict, fallback: dict):
        self._user = user          # immutable (from the caller's perspective)
        self._defaults = defaults  # finalize-written defaults
        self._fallback = fallback  # signature defaults

    # -- reads ------------------------------------------------------------
    def _layers(self):
        return (self._user, self._defaults, self._fallback)

    def __contains__(self, key):
        return any(key in layer for layer in self._layers())

    def keys(self):
        seen = {}
        for layer in self._layers():
            for k in layer:
                seen.setdefault(k, None)
        return list(seen)

    def __iter__(self):
        return iter(self.keys())

    def get(self, key, default=None):
        return self[key] if key in self else default

    def __getitem__(self, key):
        for layer in self._layers():
            if key in layer:
                first = layer[key]
                break
        else:
            raise KeyError(key)
        if not isinstance(first, dict):
            return first
        # Dict value: return a sub-view whose writes land in our defaults layer.
        user = self._user.get(key)
        user = user if isinstance(user, dict) else {}
        dsub = self._defaults.get(key)
        if not isinstance(dsub, dict):
            dsub = {}
            self._defaults[key] = dsub
        fsub = self._fallback.get(key)
        fsub = fsub if isinstance(fsub, dict) else {}
        return DogmaticView(user, dsub, fsub)

    # -- writes -----------------------------------------------------------
    def __setitem__(self, key, value):
        if isinstance(value, DogmaticView):
            value = value.to_dict()
        # Only user values and earlier finalize writes are dogmatic; the
        # signature-fallback layer never blocks a write.
        existing = None
        found = False
        for layer in (self._user, self._defaults):
            if key in layer:
                existing = layer[key]
                found = True
                break
        if not found:
            self._defaults[key] = _copy_nested(value)
            return
        if isinstance(existing, dict) and isinstance(value, dict):
            # Merge: fill only missing sub-keys (respecting all layers).
            sub = self[key]
            if (
                'factory' in value
                and 'factory' in sub
                and class_to_str(value['factory']) != class_to_str(sub['factory'])
            ):
                # Factory mismatch: the pre-existing factory wins wholesale.
                return
            for k, v in value.items():
                sub[k] = v
        # else: scalar already set -> dogmatic, ignore.

    def setdefault(self, key, value):
        self[key] = value
        return self[key]

    def update(self, other):
        for k, v in dict(other).items():
            self[k] = v

    # -- materialize ------------------------------------------------------
    def to_dict(self):
        out = {}
        for k in self.keys():
            v = self[k]
            if isinstance(v, DogmaticView):
                v = v.to_dict()
            out[k] = _copy_nested(v)
        return out

    def __repr__(self):
        return f'DogmaticView({self.to_dict()!r})'


# ---------------------------------------------------------------------------
# get_config / from_config
# ---------------------------------------------------------------------------

def _signature_defaults(factory):
    """Defaults of ``factory.__init__`` (or dataclass fields)."""
    out = {}
    required = []
    try:
        sig = inspect.signature(factory)
    except (TypeError, ValueError):
        return out, required
    for name, p in sig.parameters.items():
        if p.kind in (p.VAR_POSITIONAL, p.VAR_KEYWORD):
            continue
        if p.default is inspect.Parameter.empty:
            required.append(name)
        elif type(p.default).__name__ == '_HAS_DEFAULT_FACTORY_CLASS':
            # dataclass default_factory sentinel; handled by the caller.
            required.append(name)
        else:
            out[name] = p.default
    return out, required


def get_config(factory, updates=None) -> dict:
    """Build the complete config for ``factory`` with ``updates`` layered on top."""
    factory_cls = import_class(factory)
    user = _copy_nested(updates) if updates else {}
    user.pop('factory', None)

    fallback, required = _signature_defaults(factory_cls)
    # Dataclass default_factory handling
    if dataclasses.is_dataclass(factory_cls):
        for f in dataclasses.fields(factory_cls):
            if f.default_factory is not dataclasses.MISSING:  # type: ignore
                d = f.default_factory()  # type: ignore
                if isinstance(d, Configurable):
                    fallback[f.name] = {'factory': class_to_str(type(d))}
                elif isinstance(d, (dict, list, str, int, float, bool, tuple, type(None))):
                    fallback[f.name] = d
                if f.name in required:
                    required.remove(f.name)

    defaults: dict = {}
    view = DogmaticView(user, defaults, fallback)
    finalize = getattr(factory_cls, 'finalize_dogmatic_config', None)
    if finalize is not None:
        finalize(view)

    config = view.to_dict()

    # Fill any remaining signature defaults and check required args.
    for k, v in fallback.items():
        if k not in config:
            config[k] = v
        elif isinstance(config[k], dict) and isinstance(v, dict):
            config[k] = nested_merge(v, config[k])
    missing = [r for r in required if r not in config]
    if missing:
        raise ValueError(
            f'Missing required config keys for {class_to_str(factory_cls)}: {missing}'
        )

    # Recurse into nested factory configs.
    for k, v in list(config.items()):
        if is_factory_config(v):
            config[k] = get_config(v['factory'], {kk: vv for kk, vv in v.items() if kk != 'factory'})
            config[k] = {'factory': class_to_str(import_class(v['factory'])), **config[k]}

    # Drop keys not accepted by the factory signature (defensive).
    return {'factory': class_to_str(factory_cls), **{
        k: v for k, v in config.items() if k != 'factory'
    }}


def from_config(config):
    """Recursively instantiate a factory config."""
    if is_factory_config(config):
        factory = import_class(config['factory'])
        kwargs = {
            k: from_config(v) for k, v in config.items() if k != 'factory'
        }
        return factory(**kwargs)
    if isinstance(config, dict):
        return {k: from_config(v) for k, v in config.items()}
    if isinstance(config, list):
        return [from_config(v) for v in config]
    return config


class Configurable:
    """Mixin giving classes the factory-config API."""

    @classmethod
    def get_config(cls, updates=None):
        return get_config(cls, updates)

    @classmethod
    def from_config(cls, config):
        if is_factory_config(config):
            return from_config(config)
        return from_config({'factory': class_to_str(cls), **(config or {})})

    @classmethod
    def new(cls, updates=None):
        """Shortcut: build config with updates and instantiate."""
        return from_config(cls.get_config(updates))

    # Subclasses may override:
    # @classmethod
    # def finalize_dogmatic_config(cls, config): ...


# ---------------------------------------------------------------------------
# YAML round-trip
# ---------------------------------------------------------------------------

class _ConfigDumper(yaml.SafeDumper):
    pass


def _represent_tuple(dumper, data):
    return dumper.represent_list(list(data))


def _represent_path(dumper, data):
    return dumper.represent_str(str(data))


_ConfigDumper.add_representer(tuple, _represent_tuple)
_ConfigDumper.add_multi_representer(Path, _represent_path)


def _stringify_factories(obj):
    if isinstance(obj, dict):
        return {
            k: (class_to_str(v) if k == 'factory' else _stringify_factories(v))
            for k, v in obj.items()
        }
    if isinstance(obj, (list, tuple)):
        return [_stringify_factories(v) for v in obj]
    if isinstance(obj, Path):
        return str(obj)
    return obj


def dumps_yaml(config) -> str:
    return yaml.dump(
        _stringify_factories(config), Dumper=_ConfigDumper,
        default_flow_style=False, sort_keys=False,
    )


def dump_yaml(config, path):
    path = Path(path)
    tmp = path.with_suffix(path.suffix + '.tmp')
    tmp.write_text(dumps_yaml(config))
    tmp.replace(path)  # atomic on POSIX


def load_yaml(path):
    with open(path) as f:
        return yaml.safe_load(f)
