"""Checkpointing: named-parameter npz format + latest/best bookkeeping.

Equivalent of the reference's trainer-side checkpoints
(``ckpt_<it>.pth`` / ``ckpt_latest.pth`` / ``ckpt_best_loss.pth``,
``experiment.py:224``, ``run_tssep.py:49``), re-designed for pytrees:

- model params are stored under dotted path names
  (``model/mask_estimator.post_net.linear2.weight``) so cross-task
  warm-start transforms (VAD->SEP broadcast) address parameters by name;
- optimizer state is stored as anonymous leaves restored into a freshly
  initialized state of identical treedef;
- ``ckpt_latest.npz`` / ``ckpt_best_loss.npz`` are symlinks.
"""

from __future__ import annotations

import io
import json
from pathlib import Path

import jax
import numpy as np

__all__ = ['save_checkpoint', 'load_checkpoint', 'params_to_named',
           'named_to_params', 'latest_checkpoint', 'wait_for_pending']


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, 'key'):
            parts.append(str(p.key))
        elif hasattr(p, 'idx'):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return '.'.join(parts)


def _to_host(leaf) -> np.ndarray:
    """Fetch one leaf to host, gathering cross-process shards if needed."""
    if isinstance(leaf, jax.Array) and not leaf.is_fully_addressable:
        from jax.experimental import multihost_utils
        # tiled=True: gather the GLOBAL array value (stack-by-process mode
        # rejects non-fully-addressable inputs).
        return np.asarray(multihost_utils.process_allgather(leaf,
                                                            tiled=True))
    return np.asarray(leaf)


def params_to_named(params) -> dict:
    """Flatten a params pytree into {dotted_name: np.ndarray}."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    return {_path_str(path): _to_host(leaf) for path, leaf in flat}


def named_to_params(named: dict, template):
    """Rebuild a pytree with ``template``'s structure from named leaves."""
    leaves, treedef = jax.tree_util.tree_flatten(template)
    flat = jax.tree_util.tree_flatten_with_path(template)[0]
    names = [_path_str(path) for path, _ in flat]
    missing = [n for n in names if n not in named]
    if missing:
        raise KeyError(f'Checkpoint is missing parameters: {missing}')
    new_leaves = [np.asarray(named[n]) for n in names]
    for name, new, old in zip(names, new_leaves, leaves):
        if new.shape != tuple(old.shape):
            raise ValueError(
                f'Shape mismatch for {name}: ckpt {new.shape} vs model '
                f'{tuple(old.shape)}')
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


class _AsyncWriter:
    """Single background worker serializing checkpoint writes in order.

    The Orbax-async idea sized to the npz format: the device->host fetch
    happens synchronously in ``save_checkpoint`` (params are donated into
    the next update, so the values must be captured at the trigger), while
    npz serialization + disk write + symlink updates — the slow host part —
    overlap with training.  ``wait()`` drains the queue (call before load/
    resume and at training end)."""

    def __init__(self):
        import queue
        import threading
        self._q = queue.Queue()
        self._err = None
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        while True:
            item = self._q.get()
            try:
                if item is not None:
                    path, payload, best, after = item
                    _write_payload(path, payload, best)
                    if after is not None:
                        after()
            except Exception as e:  # noqa: BLE001 - surfaced by wait()
                self._err = e
            finally:
                self._q.task_done()

    def submit(self, *item):
        self.check()
        self._q.put(item)

    def wait(self):
        self._q.join()
        self.check()

    def check(self):
        if self._err is not None:
            err, self._err = self._err, None
            raise RuntimeError('async checkpoint write failed') from err


_ASYNC_WRITER = None


def _async_writer() -> _AsyncWriter:
    global _ASYNC_WRITER
    if _ASYNC_WRITER is None:
        _ASYNC_WRITER = _AsyncWriter()
    return _ASYNC_WRITER


def wait_for_pending():
    """Block until queued async checkpoint writes have hit the disk."""
    if _ASYNC_WRITER is not None:
        _ASYNC_WRITER.wait()


def _write_payload(path: Path, payload: dict, best: bool):
    buf = io.BytesIO()
    np.savez(buf, **payload)
    tmp = path.with_suffix('.tmp')
    tmp.write_bytes(buf.getvalue())
    tmp.replace(path)
    _relink(path.parent / 'ckpt_latest.npz', path)
    if best:
        _relink(path.parent / 'ckpt_best_loss.npz', path)


def save_checkpoint(ckpt_dir, iteration, params, opt_state=None, meta=None,
                    best=False, async_write=False, write=True,
                    after_write=None):
    """``write=False`` runs the (collective) host-gather of every leaf but
    skips the disk IO — multi-host callers pass
    ``write=(process_index()==0)`` so ALL processes participate in the
    gather while one writes.  ``after_write`` runs after the file and
    symlinks are on disk (in the worker thread when ``async_write``) —
    e.g. a retention-pruning callback."""
    ckpt_dir = Path(ckpt_dir)
    payload = {}
    for name, arr in params_to_named(params).items():
        payload[f'model/{name}'] = arr
    if opt_state is not None:
        for i, leaf in enumerate(jax.tree_util.tree_leaves(opt_state)):
            payload[f'opt/{i:05d}'] = _to_host(leaf)
    if not write:
        return None
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    meta = dict(meta or {})
    meta['iteration'] = int(iteration)
    payload['__meta__'] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8)

    path = ckpt_dir / f'ckpt_{iteration}.npz'
    if async_write:
        _async_writer().submit(path, payload, best, after_write)
    else:
        _write_payload(path, payload, best)
    return path


def _relink(link: Path, target: Path):
    if link.is_symlink() or link.exists():
        link.unlink()
    link.symlink_to(target.name)


def load_checkpoint(path, params_template=None, opt_state_template=None):
    """Returns (named_params | params, opt_state | None, meta)."""
    path = Path(path)
    with np.load(path, allow_pickle=False) as z:
        names = list(z.files)
        meta = {}
        if '__meta__' in names:
            meta = json.loads(bytes(z['__meta__']).decode())
        named = {n[len('model/'):]: z[n] for n in names
                 if n.startswith('model/')}
        opt_leaves = [z[n] for n in sorted(names) if n.startswith('opt/')]

    params = (named_to_params(named, params_template)
              if params_template is not None else named)
    opt_state = None
    if opt_state_template is not None and opt_leaves:
        leaves, treedef = jax.tree_util.tree_flatten(opt_state_template)
        if len(leaves) == len(opt_leaves):
            cast = [np.asarray(new, dtype=np.asarray(old).dtype)
                    if hasattr(old, 'dtype') else new
                    for new, old in zip(opt_leaves, leaves)]
            opt_state = jax.tree_util.tree_unflatten(treedef, cast)
    return params, opt_state, meta


def latest_checkpoint(ckpt_dir):
    p = Path(ckpt_dir) / 'ckpt_latest.npz'
    return p if p.exists() else None
