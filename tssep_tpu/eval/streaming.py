"""Streaming / low-latency inference (beyond-reference serving mode).

The reference processes whole recordings offline; this module runs the
TS-VAD/TS-SEP model incrementally with bounded latency:

- audio arrives in blocks; the session keeps an STFT frame buffer and emits
  masks/activity for ``chunk_frames`` once ``chunk_frames + lookahead_frames``
  are available -> algorithmic latency = (chunk + lookahead) frames;
- the **forward (causal) LSTM directions are exact**: their ``(h, c)``
  carries are committed at each chunk boundary and continue across blocks
  (``_blstm_streaming`` below, on the ``nn.rnnp._lstm_scan`` primitive);
- the **reverse (anti-causal) directions** are re-run per block over
  ``chunk + lookahead`` with zero initial state — the only approximation,
  bounded by the lookahead window (with lookahead >= remaining utterance
  the output is bit-identical to offline inference, see
  ``tests/test_streaming.py``);
- feature normalization statistics that are global offline (e.g. the
  ``Log1pMaxNormAbs`` max, MVN means, MFCC top-db reference) are maintained
  causally as running statistics via the per-extractor
  ``streaming_feature`` protocol (``features.extractor``); extractors with
  no causal equivalent raise loudly instead of silently changing semantics;
- with ``emit_audio=True`` the session also performs streaming enhancement:
  per-chunk mask-multiply + incremental ISTFT overlap-add (carrying the
  ``window_length - shift`` unfinished tail), emitting separated audio with
  the same latency as the masks.

Usage::

    sess = StreamingSession(model, params, aux, chunk_frames=50,
                            lookahead_frames=12, emit_audio=True)
    for block in audio_blocks:                 # arbitrary sample counts
        for masks, activity, audio in sess.process(block):
            ...         # (S, nmask, chunk, F), (S, chunk), (S, samples)
    for masks, activity, audio in sess.flush():
        ...
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tssep_tpu.nn.rnnp import _lstm_scan

__all__ = ['StreamingSession']


def _blstm_streaming(params, x, split, hidden_size, state):
    """One BLSTM layer over a block ``x = [chunk | lookahead]``.

    Forward direction: exact, stateful across blocks; the carry is
    committed at ``split`` (the chunk boundary).  Reverse: zero-init over
    the whole block.  Returns (out (B, T, 2H), state_at_split).
    """
    B = x.shape[0]
    H = hidden_size

    def xg_of(suffix):
        w_ih = params['weight_ih_l0' + suffix].astype(x.dtype)
        b = (params['bias_ih_l0' + suffix]
             + params['bias_hh_l0' + suffix]).astype(x.dtype)
        return jnp.swapaxes(x @ w_ih.T + b, 0, 1)       # (T, B, 4H)

    if state is None:
        state = (jnp.zeros((B, H), x.dtype), jnp.zeros((B, H), x.dtype))
    xg_f = xg_of('')
    ys_c, state_mid = _lstm_scan(xg_f[:split], params['weight_hh_l0'],
                                 state[0], state[1], reverse=False,
                                 return_state=True)
    ys_l = _lstm_scan(xg_f[split:], params['weight_hh_l0'],
                      state_mid[0], state_mid[1], reverse=False)
    ys_f = jnp.concatenate([ys_c, ys_l], axis=0)
    zero = jnp.zeros((B, H), x.dtype)
    ys_r = _lstm_scan(xg_of('_reverse'), params['weight_hh_l0_reverse'],
                      zero, zero, reverse=True)
    out = jnp.concatenate([ys_f, ys_r], axis=-1)
    return jnp.swapaxes(out, 0, 1), state_mid


def _rnnp_streaming(block, params, x, split, states):
    """RNNP stack over a block; rank-3/4 input as in RNNP.apply."""
    rank = x.ndim
    lead = x.shape[:-2]
    h = x.reshape((-1,) + x.shape[2:]) if rank == 4 else x
    if states is None:
        states = [None] * block.elayers
    new_states = []
    for i in range(block.elayers):
        h, st = _blstm_streaming(params[f'lstm{i}'], h, split, block.cdim,
                                 states[i])
        new_states.append(st)
        p = params[f'proj{i}']
        h = h @ p['weight'].T.astype(h.dtype) + p['bias'].astype(h.dtype)
        if i < block.elayers - 1:
            h = jnp.tanh(h)
    if rank == 4:
        h = h.reshape(lead + h.shape[1:])
    return h, new_states


@dataclasses.dataclass
class StreamingSession:
    """Stateful incremental inference over one recording.

    model: the assembled ``tasks.model.Model``; params: its parameters;
    aux: (S, A) enrollment embeddings (or aux frames when the model has an
    ``aux_net``).
    """

    model: object
    params: dict
    aux: object
    chunk_frames: int = 50
    lookahead_frames: int = 12
    #: emit separated audio per chunk (streaming masking + ISTFT
    #: overlap-add; the offline synthesis half of reference
    #: ``model.py:661-664``).  ``process``/``flush`` then yield
    #: ``(masks, activity, audio (S, samples))`` triples.
    emit_audio: bool = False

    def __post_init__(self):
        me = self.model.mask_estimator
        assert me.num_averaged_permutations in (0, 1), \
            'streaming supports num_averaged_permutations<=1'
        mp = self.params['mask_estimator']
        aux = jnp.asarray(np.asarray(self.aux), jnp.float32)[None]  # (1,S,A)
        if me.aux_net is not None:
            aux = me.aux_net.apply(mp['aux_net'], aux)
        elif me.aux_normalizer is not None:
            aux = me.aux_normalizer(aux)
        self._aux = aux                                   # (1, S, A')
        self._states = {'pre_net': None,
                        **{f'birnn{i}': None for i in range(me.layers)}}
        self._sample_buf = np.zeros(0, dtype=np.float32)
        self._frame_buf = None                            # (T, F) complex
        self._consumed_samples = 0
        self._fe_state = self.model.fe.init_streaming_state()
        self._ola_tail = None                             # (S, wl - shift)
        if self.emit_audio:
            fe = self.model.fe
            if me.odim != fe.size // 2 + 1:
                raise ValueError(
                    f'emit_audio needs masks over all STFT bins: odim='
                    f'{me.odim} != {fe.size // 2 + 1} frequencies')
        self._step = jax.jit(self._block_fn,
                             static_argnames=('split',))

    # -- device block function --------------------------------------------
    def _block_fn(self, params, feats, aux, states, *, split):
        me = self.model.mask_estimator
        mp = params['mask_estimator']
        xs = feats[None]                                  # (1, T, F)
        new_states = dict(states)
        if me.input_normalizer is not None:
            xs = me.input_normalizer(xs)
        if me.pre_net is not None:
            xs, new_states['pre_net'] = _rnnp_streaming(
                me.pre_net, mp['pre_net'], xs, split, states['pre_net'])
        if me.combination == 'mul':
            h = xs[:, None, :, :] * aux[:, :, None, :]
        else:
            B, T = xs.shape[0], xs.shape[1]
            S = aux.shape[1]
            h = jnp.concatenate(
                [jnp.broadcast_to(xs[:, None], (B, S, T, xs.shape[-1])),
                 jnp.broadcast_to(aux[:, :, None, :],
                                  (B, S, T, aux.shape[-1]))], axis=-1)
        for l in range(me.layers):
            if l == me.layers - 1 and me.ts_vad:
                h = jnp.swapaxes(h, 1, 2)
                h = h.reshape(h.shape[:2] + (1, -1))
                h = jnp.swapaxes(h, 1, 2)
            h, new_states[f'birnn{l}'] = _rnnp_streaming(
                me.birnns[l], mp['post_net'][f'birnn{l}'], h, split,
                states[f'birnn{l}'])
            if l < me.layers - 1:
                h = jnp.tanh(h)
        lin = mp['post_net'][f'linear{me.layers - 1}']
        logit = (h @ lin['weight'].T.astype(h.dtype)
                 + lin['bias'].astype(h.dtype))
        logit = me.reshape_head(logit, self._aux.shape[1],
                                feats.shape[0])           # (1,S,nmask,T,F')
        return logit, new_states

    # -- host-side buffering ----------------------------------------------
    def _stft_more(self):
        """Consume buffered samples into complete STFT frames (causal:
        no fading pre-roll; frames are emitted as soon as their window is
        complete)."""
        fe = self.model.fe
        wl, shift = fe.window_length, fe.shift
        n = len(self._sample_buf)
        if n < wl:
            return
        num_frames = (n - wl) // shift + 1
        seg = self._sample_buf[:(num_frames - 1) * shift + wl]
        frames = np.lib.stride_tricks.sliding_window_view(
            seg, wl)[::shift]
        window = np.asarray(fe._stft.analysis_window)
        spec = np.fft.rfft(frames * window, n=fe.size, axis=-1)
        self._sample_buf = self._sample_buf[num_frames * shift:]
        self._frame_buf = (spec if self._frame_buf is None
                           else np.concatenate([self._frame_buf, spec]))

    def _emit_ready(self, final=False):
        """Yield (masks, activity[, audio]) per complete chunk."""
        need = self.chunk_frames + self.lookahead_frames
        while self._frame_buf is not None and (
                len(self._frame_buf) >= need
                or (final and len(self._frame_buf) > 0)):
            block = self._frame_buf[:need]
            split = min(self.chunk_frames, len(block))
            feats = np.asarray(self._features(block, split),
                               dtype=np.float32)
            logit, self._states = self._step(
                self.params, jnp.asarray(feats), self._aux, self._states,
                split=int(split))
            sig = jax.nn.sigmoid(logit[0])                # (S, nmask, T, F')
            masks = np.asarray(sig[..., :split, :])
            # per-speaker frame activity = mask mean over (nmask, freq)
            activity = masks.mean(axis=(-3, -1))
            last = len(self._frame_buf) <= split
            if self.emit_audio:
                audio = self._synthesize(
                    masks[:, 0] * block[None, :split], final=final and last)
            self._frame_buf = self._frame_buf[split:]
            if len(self._frame_buf) == 0:
                self._frame_buf = None
            if self.emit_audio:
                yield masks, activity, audio
            else:
                yield masks, activity

    def _features(self, block, split=None):
        """Block features with *causal* statistics (running max/mean where
        the offline extractor uses utterance-level ones).

        Statistics PEEK over the whole visible block (committed + chunk +
        lookahead — all genuinely available within the latency budget; with
        covering lookahead this reproduces offline utterance statistics
        exactly), but only the first ``split`` frames are COMMITTED into
        the persistent state, so re-processed lookahead frames are never
        double-counted (which would bias running means)."""
        fe = self.model.fe
        feats, peek_state = fe.streaming_feature(block, self._fe_state)
        commit = block if split is None else block[:split]
        if len(commit) == len(block):
            self._fe_state = peek_state
        else:
            _, self._fe_state = fe.streaming_feature(commit, self._fe_state)
        return feats

    def _synthesize(self, masked, final=False):
        """Streaming ISTFT: overlap-add of ``masked`` (S, T, F) complex
        frames, carrying the (window_length - shift) unfinished tail across
        chunks.  Matches offline ``signal.stft.STFT.istft`` with
        ``fading=False`` sample-for-sample."""
        fe = self.model.fe
        wl, shift = fe.window_length, fe.shift
        T = masked.shape[-2]
        segs = np.fft.irfft(masked, n=fe.size, axis=-1)[..., :wl]
        segs = segs * np.asarray(fe._stft.synthesis_window)
        total = (T - 1) * shift + wl
        out = np.zeros(masked.shape[:-2] + (total,), dtype=segs.dtype)
        for f in range(T):
            out[..., f * shift:f * shift + wl] += segs[..., f, :]
        if self._ola_tail is not None:
            out[..., :wl - shift] += self._ola_tail
        if final:
            self._ola_tail = None
            return out
        self._ola_tail = out[..., T * shift:]
        return out[..., :T * shift]

    def process(self, samples):
        """Feed a block of audio samples; yields zero or more
        ``(masks (S, nmask, chunk, F), activity (S, chunk))`` chunks."""
        self._sample_buf = np.concatenate(
            [self._sample_buf, np.asarray(samples, dtype=np.float32)])
        self._stft_more()
        yield from self._emit_ready()

    def flush(self):
        """Emit everything left in the buffers (end of stream)."""
        self._stft_more()
        yield from self._emit_ready(final=True)
