"""Experiment CLI: ``python -m tssep_tpu.train.run [command] with cfg.yaml
a.b=c ...`` (sacred-style layering, last wins; reference
``tssep/train/run.py``).

Commands: ``init`` (write storage dir: config.yaml with timestamped backups,
Makefile, python_history.txt audit log, log files), ``train`` (init + run),
``makefile``, ``print_config``.
"""

from __future__ import annotations

import datetime
import filecmp
import os
import shlex
import shutil
import sys
from pathlib import Path

import yaml

from tssep_tpu.config.configurable import (
    dump_yaml, dumps_yaml, from_config, load_yaml, nested_merge, nested_set,
)
from tssep_tpu.train.experiment import Experiment

__all__ = ['main', 'build_config', 'init', 'train']


#: '--' flags the CLIs understand; anything else is rejected loudly.
KNOWN_FLAGS = {'pdb'}


def parse_argv(argv):
    """Returns (command, config_files, overrides).  '--<flag>' tokens are
    validated against KNOWN_FLAGS (callers re-scan argv for the ones they
    honor, e.g. ``--pdb`` in :func:`main`)."""
    command = 'train'
    rest = list(argv)
    if rest and rest[0] in ('init', 'train', 'makefile', 'print_config'):
        command = rest.pop(0)
    if rest and rest[0] == 'with':
        rest.pop(0)
    files, overrides = [], {}
    for token in rest:
        if token.startswith('--'):
            if token[2:] not in KNOWN_FLAGS:
                raise ValueError(
                    f'Unknown flag {token!r} (known: '
                    f'{sorted("--" + f for f in KNOWN_FLAGS)})')
        elif '=' in token and not token.endswith(('.yaml', '.yml')):
            key, _, value = token.partition('=')
            overrides[key] = yaml.safe_load(value)
        else:
            files.append(token)
    return command, files, overrides


def build_config(files=(), overrides=None):
    cfg = {'eg': {'trainer': {'storage_dir': None}}}
    for f in files:
        layer = load_yaml(f)
        cfg = nested_merge(cfg, layer)
    for key, value in (overrides or {}).items():
        nested_set(cfg, key, value)

    eg_cfg = Experiment.get_config(cfg['eg'])
    if eg_cfg['trainer'].get('storage_dir') in (None, ''):
        root = Path.cwd() / 'egs' / 'extract'
        root.mkdir(parents=True, exist_ok=True)
        existing = [int(p.name) for p in root.iterdir()
                    if p.name.isdigit()]
        eg_cfg['trainer']['storage_dir'] = str(
            root / str(max(existing, default=0) + 1))
    cfg['eg'] = eg_cfg
    return cfg


def backup_config(config_yaml: Path):
    ts = datetime.datetime.fromtimestamp(
        config_yaml.stat().st_mtime).strftime('%Y_%m_%d_%H_%M_%S')
    backup_file = (config_yaml.parent / 'backup'
                   / config_yaml.name.replace('.yaml', f'_{ts}.yaml'))
    if backup_file.exists():
        if filecmp.cmp(backup_file, config_yaml):
            return
        ts = datetime.datetime.today().strftime('%Y_%m_%d_%H_%M_%S')
        backup_file = (config_yaml.parent / 'backup'
                       / config_yaml.name.replace('.yaml', f'_{ts}.yaml'))
    backup_file.parent.mkdir(exist_ok=True)
    shutil.copy(config_yaml, backup_file)


def dump_config(storage_dir, config):
    storage_dir = Path(storage_dir)
    config_yaml = storage_dir / 'config.yaml'
    new_content = dumps_yaml(config)
    if config_yaml.exists():
        backup_config(config_yaml)
        if config_yaml.read_text() == new_content:
            return
    dump_yaml(config, config_yaml)


def write_makefile(storage_dir):
    storage_dir = Path(storage_dir)
    main_path = 'tssep_tpu.train.run'
    (storage_dir / 'Makefile').write_text(f'''SHELL := /bin/bash

.PHONY: help init run makefile

help:
\tcat Makefile

init:
\t# Update config.yaml and Makefile. Print config.
\tpython -m {main_path} init with config.yaml

run:
\tpython -m {main_path} with config.yaml

makefile:
\t@# Update this makefile.
\tpython -m {main_path} makefile with config.yaml
''')


def run_with_pdb(fn, use_pdb):
    """sacred's ``--pdb`` equivalent: run ``fn()``; on failure drop into
    the post-mortem debugger (shared by the train and eval CLIs)."""
    try:
        return fn()
    except Exception:
        if not use_pdb:
            raise
        import pdb
        import traceback
        traceback.print_exc()
        pdb.post_mortem()
        raise


def host_info():
    """Environment snapshot for the storage dir (sacred host-info
    equivalent, reference ``run.py:59-68``: CUDA/SLURM/OMP env there;
    JAX/TPU/SLURM env here)."""
    import platform
    import jax
    keys = [k for k in os.environ
            if k.startswith(('SLURM', 'TPU', 'JAX', 'XLA', 'TSSEP', 'OMP'))]
    info = {
        'hostname': platform.node(),
        'platform': platform.platform(),
        'python': sys.version.split()[0],
        'jax': jax.__version__,
        'argv': sys.argv,
        'cwd': str(Path.cwd()),
        'env': {k: os.environ[k] for k in sorted(keys)},
    }
    try:
        info['devices'] = [str(d) for d in jax.devices()]
        info['process_index'] = jax.process_index()
        info['process_count'] = jax.process_count()
    except Exception as e:  # noqa: BLE001 - no backend available yet
        info['devices'] = f'unavailable: {e}'
    return info


def init(config):
    storage_dir = Path(config['eg']['trainer']['storage_dir'])
    storage_dir.mkdir(exist_ok=True, parents=True)

    with open(storage_dir / 'python_history.txt', 'a') as fd:
        print(f'{shlex.join(sys.argv)}'
              f'  # {datetime.datetime.today().strftime("%Y.%m.%d %H:%M:%S")}'
              f'  # {Path.cwd()}', file=fd)

    import json
    (storage_dir / 'host_info.json').write_text(
        json.dumps(host_info(), indent=1, default=str))

    cwd = Path.cwd()
    if cwd.parts[:-1] == storage_dir.parts[:-1]:
        assert cwd == storage_dir, (cwd, storage_dir)

    dump_config(storage_dir, config)
    print(dumps_yaml(config))
    write_makefile(storage_dir)

    eg: Experiment = from_config(config['eg'])
    eg.add_log_files()
    print(f'Initialized {storage_dir}')
    return eg


def train(config):
    init(config)
    eg: Experiment = from_config(config['eg'])
    eg.train()
    return eg


def main(argv=None):
    # Honor JAX_PLATFORMS even when a site customization force-registered a
    # different backend (e.g. tests forcing cpu) — without clobbering an
    # explicit in-process jax.config.update by the caller.
    from tssep_tpu.utils.platform import honor_jax_platforms_env
    honor_jax_platforms_env()
    if argv is None:
        argv = sys.argv[1:]
    use_pdb = '--pdb' in argv

    def dispatch():
        command, files, overrides = parse_argv(argv)
        config = build_config(files, overrides)
        if command == 'print_config':
            print(dumps_yaml(config))
        elif command == 'init':
            init(config)
        elif command == 'makefile':
            write_makefile(config['eg']['trainer']['storage_dir'])
        elif command == 'train':
            train(config)
        else:
            raise ValueError(command)

    run_with_pdb(dispatch, use_pdb)


if __name__ == '__main__':
    print(shlex.join(sys.argv))
    main()
