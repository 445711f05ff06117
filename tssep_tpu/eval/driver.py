"""Long-recording eval driver: chunked mask estimation, diarization,
segment-(parallel) beamforming, stitching, and metrics.

The reference keeps its eval driver in the companion repo (tssep_data,
per ``README.md:79-82``); the in-repo hooks it relies on are
``Model.prepare_eval_dataset``, ``ClassicBF_np`` and the frame/sample VAD
conversions — all of which exist here natively.  This module supplies the
driver itself, TPU-first:

1. the recording's STFT is computed once (optionally WPE-preprocessed);
2. the mask estimator runs on overlapping fixed-size chunks batched together
   (static shapes for jit; chunks are the data-parallel axis — shardable
   over a mesh for multi-chip inference);
3. chunk masks/VAD logits are stitched by overlap-discard;
4. frame activity is thresholded + median-smoothed into per-speaker
   ``ArrayInterval`` diarization;
5. the offline beamformer (or mask-multiply) reconstructs each speaker, and
   ``istft_vad`` maps activity back to samples.
"""

from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

from tssep_tpu.eval.classic_bf import ClassicBF
from tssep_tpu.eval.metrics import der
from tssep_tpu.signal.intervals import ArrayInterval
from tssep_tpu.signal.vad import istft_vad

__all__ = ['ChunkedMaskEstimator', 'diarize_from_activity', 'EvalDriver',
           'stitch_chunks', 'median_smooth', 'to_numpy', 'activity_from_sig']


def to_numpy(x):
    """Device -> host fetch that also works for complex arrays on TPU
    runtimes whose D2H path lacks complex support (fetch re/im separately)."""
    if isinstance(x, np.ndarray):
        return x
    if jnp.iscomplexobj(x):
        return (np.asarray(jnp.real(x))
                + 1j * np.asarray(jnp.imag(x)))
    return np.asarray(x)


def _chunk_starts(num_frames, chunk, hop):
    if num_frames <= chunk:
        return [0]
    starts = list(range(0, num_frames - chunk + 1, hop))
    if starts[-1] + chunk < num_frames:
        starts.append(num_frames - chunk)
    return starts


def stitch_chunks(chunks, starts, num_frames, chunk, hop, time_axis):
    """Overlap-discard stitching: interior chunks contribute their center."""
    out = None
    filled = np.zeros(num_frames, dtype=bool)
    margin = (chunk - hop) // 2
    for arr, s in zip(chunks, starts):
        arr = np.asarray(arr)
        if out is None:
            shape = list(arr.shape)
            shape[time_axis] = num_frames
            out = np.zeros(shape, dtype=arr.dtype)
        lo = 0 if s == 0 else margin
        hi = chunk if s + chunk >= num_frames else chunk - margin
        idx_out = [slice(None)] * out.ndim
        idx_in = [slice(None)] * out.ndim
        idx_out[time_axis] = slice(s + lo, s + hi)
        idx_in[time_axis] = slice(lo, hi)
        out[tuple(idx_out)] = arr[tuple(idx_in)]
        filled[s + lo:s + hi] = True
    assert filled.all(), 'stitching left gaps'
    return out


def activity_from_sig(sig, stat):
    """Frame activity from the (spk, T, F) sigmoid mask: a frequency
    statistic per frame.  ``stat``: 'mean' (the TS-SEP recipe default) or
    'qNN' (frequency quantile, e.g. 'q90')."""
    if stat.startswith('q'):
        return np.quantile(sig, float(stat[1:]) / 100, axis=-1)
    assert stat == 'mean', stat
    return sig.mean(-1)


def median_smooth(activity, kernel=11):
    """Median filter along the last axis (odd kernel)."""
    if kernel <= 1:
        return activity
    import scipy.ndimage
    return scipy.ndimage.median_filter(
        activity.astype(np.float32), size=(1,) * (activity.ndim - 1) + (kernel,)
    ) > 0.5


def diarize_from_activity(activity, threshold=0.5, smooth_kernel=11,
                          min_frames=0, merge_gap=0, pad_frames=0):
    """(spk, frames) scores -> list of per-speaker ArrayIntervals.

    ``merge_gap``: bridge silences shorter than this many frames before
    the ``min_frames`` filter — standard diarization post-processing for
    speech with in-turn pauses (the word-vocabulary corpora pause
    ~0.25 s between words while the reference activity is turn-level).

    ``pad_frames``: dilate every surviving interval by this many frames on
    both sides (onset/offset collar).  Mask-derived activity starts at the
    first frame with signal energy while reference VAD marks turn onsets
    slightly earlier (window overlap + annotation margin); median smoothing
    additionally erodes ~kernel/2 frames per boundary."""
    act = np.asarray(activity) > threshold
    act = median_smooth(act, smooth_kernel)
    out = []
    for row in act:
        ai = ArrayInterval(row)
        ivs = ai.normalized_intervals
        if merge_gap and len(ivs) > 1:
            merged = [list(ivs[0])]
            for s, e in ivs[1:]:
                if s - merged[-1][1] < merge_gap:
                    merged[-1][1] = e
                else:
                    merged.append([s, e])
            ivs = [tuple(iv) for iv in merged]
            ai = ArrayInterval(ivs, shape=len(row))
        if min_frames:
            ivs = [iv for iv in ivs if iv[1] - iv[0] >= min_frames]
            ai = ArrayInterval(ivs, shape=len(row))
        if pad_frames and ivs:
            n = len(row)
            ai = ArrayInterval(
                [(max(0, s - pad_frames), min(n, e + pad_frames))
                 for s, e in ivs], shape=n)
        out.append(ai)
    return out


@dataclasses.dataclass
class ChunkedMaskEstimator:
    """Run the mask estimator over a long recording in fixed-size chunks.

    chunk/hop in STFT frames; chunks are batched (the batch axis can be
    sharded over 'data' for multi-chip segment-parallel inference).
    """

    model: object
    chunk_frames: int = 316          # = 5 s at 16 kHz / 1024/256 STFT
    hop_frames: int = 158
    batch_chunks: int = 8
    #: Optional jax.sharding.Mesh: chunks are the data-parallel axis of
    #: long-recording inference — sharded over 'data', one jit, XLA inserts
    #: nothing (embarrassingly parallel) and each chip handles its chunks.
    mesh: object = None
    #: Frame-activity statistic over the (T, F) sigmoid mask for 'tf'
    #: output resolutions: 'mean' (the TS-SEP recipe: mask averaged over
    #: frequency) or 'qNN' (freq quantile, e.g. 'q90' — robust when
    #: active speech is frequency-sparse and the freq mean of an active
    #: frame sits near the silence floor).  'frame' resolutions are
    #: unaffected ((T, 1) masks: every statistic is the sigmoid itself).
    activity_stat: str = os.environ.get('TSSEP_EVAL_ACTIVITY', 'mean')

    def __post_init__(self):
        self._jit_cache = {}
        if self.mesh is not None:
            n = self.mesh.shape.get('data', 1)
            self.batch_chunks = max(self.batch_chunks, n)
            self.batch_chunks -= self.batch_chunks % n or 0

    def _forward_fn(self):
        if 'fwd' not in self._jit_cache:
            model = self.model

            def fwd(params, feats, aux, key):
                out = model.mask_estimator.apply(
                    params['mask_estimator'], feats, aux, rng=key,
                    training=False)
                return out.mask, (out.logit if out.logit is not None
                                  else out.vad_logit[..., None])

            self._jit_cache['fwd'] = jax.jit(fwd)
        return self._jit_cache['fwd']

    def __call__(self, params, observation_stft, aux, key=None):
        """observation_stft: (mic, T, F) complex (numpy ok); aux: (spk, A).

        Returns (masks (spk, nmask, T, F) float32, activity (spk, T)).
        """
        obs_ref = np.asarray(observation_stft)[0]  # reference channel
        num_frames = obs_ref.shape[0]
        chunk = min(self.chunk_frames, num_frames)
        hop = min(self.hop_frames, chunk)
        starts = _chunk_starts(num_frames, chunk, hop)

        feats_full = np.asarray(
            self.model.fe.stft_to_feature(obs_ref), dtype=np.float32)
        aux = jnp.asarray(np.asarray(aux, dtype=np.float32))
        if key is None:
            key = jax.random.PRNGKey(0)

        fwd = self._forward_fn()
        mask_chunks, logit_chunks = [], []
        for i in range(0, len(starts), self.batch_chunks):
            batch_starts = starts[i:i + self.batch_chunks]
            feats = np.stack([feats_full[s:s + chunk] for s in batch_starts])
            pad = self.batch_chunks - len(batch_starts)
            if pad and (len(starts) > self.batch_chunks
                        or self.mesh is not None):
                feats = np.concatenate(
                    [feats, np.repeat(feats[-1:], pad, axis=0)])
            feats = jnp.asarray(feats)
            aux_b = jnp.broadcast_to(aux[None], (feats.shape[0],) + aux.shape)
            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P
                sh = NamedSharding(self.mesh, P('data'))
                feats = jax.device_put(feats, NamedSharding(
                    self.mesh, P('data', None, None)))
                aux_b = jax.device_put(aux_b, NamedSharding(
                    self.mesh, P('data', None, None)))
            masks, logits = fwd(params, feats, aux_b, key)
            masks = np.asarray(masks)[:len(batch_starts)]
            logits = np.asarray(logits)[:len(batch_starts)]
            mask_chunks.extend(masks)
            logit_chunks.extend(logits)

        masks = stitch_chunks(mask_chunks, starts, num_frames, chunk, hop,
                              time_axis=-2)
        logits = stitch_chunks(logit_chunks, starts, num_frames, chunk, hop,
                               time_axis=-2)
        # Activity score: a freq statistic OF THE SIGMOID mask, nmask
        # squeezed (default 'mean' = the TS-SEP recipe: mask averaged over
        # frequency).  For 'frame' resolution the freq axis is a
        # singleton, so any statistic equals sigmoid(logit) exactly.
        # sigmoid(freq-mean LOGIT) — the round-3 statistic — is wrong for
        # 'tf': harmonic speech is frequency-sparse, the many strongly-
        # negative inactive bins dominate the mean, and active frames
        # score ~0.05 (chip rehearsal: calibration DER 0.776 at best
        # threshold 0.05, 11.3 s of 17.8 s missed).
        sig = 1 / (1 + np.exp(-np.squeeze(logits, axis=-3)))
        if isinstance(self.activity_stat, (list, tuple)):
            # Sweep mode (tools/sweep_activity.py): one forward pass,
            # activities for every candidate statistic.
            activity = {s: activity_from_sig(sig, s)
                        for s in self.activity_stat}
        else:
            activity = activity_from_sig(sig, self.activity_stat)
        return masks, activity


@dataclasses.dataclass
class EvalDriver:
    """End-to-end long-recording evaluation."""

    model: object
    enhancer: ClassicBF = None
    chunk_frames: int = 316
    hop_frames: int = 158
    vad_threshold: float = 0.5
    smooth_kernel: int = 11
    min_frames: int = 3
    #: Bridge sub-gap silences when diarizing (frames; 0 = off).  Set for
    #: corpora whose reference activity is turn-level while the speech
    #: pauses within turns (word-vocabulary simulations).
    merge_gap_frames: int = 0
    #: Dilate diarized intervals by this many frames per side (onset/offset
    #: collar; 0 = off).  See :func:`diarize_from_activity`.
    pad_frames: int = 0
    #: Activity statistic, forwarded to :class:`ChunkedMaskEstimator`.
    activity_stat: str = None
    #: Optional SECOND model supplying the diarization (the canonical
    #: TS-SEP deployment: the TS-VAD stage's activity drives segmentation
    #: — it is trained on activity and diarizes far better than
    #: mask-derived activity — while this driver's main model supplies
    #: the separation masks).  Reference workflow: the VAD estimates
    #: drive the enhancer's segment loop (enhancer.py:451+).
    dia_model: object = None
    dia_params: object = None

    def __post_init__(self):
        if self.enhancer is None:
            self.enhancer = ClassicBF()
        extra = ({'activity_stat': self.activity_stat}
                 if self.activity_stat else {})
        self.chunked = ChunkedMaskEstimator(
            self.model, chunk_frames=self.chunk_frames,
            hop_frames=self.hop_frames, **extra)
        self.dia_chunked = None
        if self.dia_model is not None:
            self.dia_chunked = ChunkedMaskEstimator(
                self.dia_model, chunk_frames=self.chunk_frames,
                hop_frames=self.hop_frames, **extra)

    def activity(self, params, obs_stft, aux):
        """Frame activity from the diarization source: the ``dia_model``
        when configured, else the main model's own mask statistic."""
        if self.dia_chunked is not None:
            _, activity = self.dia_chunked(self.dia_params, obs_stft, aux)
        else:
            _, activity = self.chunked(params, obs_stft, aux)
        return activity

    def run_recording(self, params, observation, aux, num_samples=None,
                      beamform=None):
        """observation: (mic, samples) float; aux: (spk, A).

        Returns dict with masks, activity, dia (frame ArrayIntervals),
        sample_dia, and (optionally beamformed) per-speaker time signals.
        """
        observation = np.asarray(observation)
        if observation.ndim == 1:
            observation = observation[None]
        if num_samples is None:
            num_samples = observation.shape[-1]
        obs_stft = self.model.fe.stft(observation)  # (mic, T, F)

        masks, activity = self.chunked(params, obs_stft, aux)
        if self.dia_chunked is not None:
            _, activity = self.dia_chunked(self.dia_params, obs_stft, aux)
        dia = diarize_from_activity(
            activity, self.vad_threshold, self.smooth_kernel,
            self.min_frames, self.merge_gap_frames, self.pad_frames)

        if beamform is None:
            beamform = observation.shape[0] >= 6
        if beamform:
            est_stft = self.enhancer(masks, np.asarray(obs_stft), dia)
        else:
            # single/few channels: masked reference channel
            est_stft = (np.asarray(obs_stft)[0][None]
                        * np.squeeze(masks, axis=-3))
            gate = np.stack([np.asarray(ai, dtype=np.float64) for ai in dia])
            est_stft = est_stft * gate[..., None]

        est_time = self.model.fe.istft(est_stft, num_samples=num_samples)
        sample_dia = istft_vad(dia, self.model.fe.window_length,
                               self.model.fe.shift, self.model.fe.fading)
        return {
            'masks': masks,
            'activity': activity,
            'dia': dia,
            'sample_dia': sample_dia,
            'stft_estimate': est_stft,
            'time_estimate': est_time,
            # number of diarized (speaker, interval) segments — for
            # beamforming this is the number of segments actually
            # beamformed; 0 means the enhancer never ran and the output is
            # silence (a failed model, not a valid result).
            'num_segments': sum(len(ai.normalized_intervals) for ai in dia),
            'beamformed': bool(beamform),
        }

    def score_der(self, result, reference_vad_samples):
        """DER of the estimated frame activity vs sample-domain reference."""
        from tssep_tpu.signal.vad import stft_vad
        ref_frames = stft_vad(np.asarray(reference_vad_samples),
                              self.model.fe.window_length,
                              self.model.fe.shift, self.model.fe.fading)
        hyp = np.stack([np.asarray(ai, dtype=bool) for ai in result['dia']])
        ref = np.asarray(ref_frames, dtype=bool)
        frames = min(ref.shape[-1], hyp.shape[-1])
        return der(ref[..., :frames], hyp[..., :frames],
                   frame_shift=self.model.fe.shift
                   / getattr(self.model.reader, 'sample_rate', 16000))

    def score_wer(self, result, reference_transcripts, transcriber,
                  sample_rate=16000):
        """cpWER of the separated streams (the DER/WER-parity harness).

        ``reference_transcripts``: one transcript (string or utterance
        list) per reference speaker; ``transcriber``: any callable
        ``(samples, sample_rate) -> str`` (``eval.wer.Transcriber``
        contract).  Each estimated stream is transcribed SEGMENT-WISE
        over its own diarization (plus a small collar) and the per-
        segment hypotheses joined in time order — the reference emits
        per-segment WAVs for ASR (enhancer.py:451+), and recognizers are
        trained on utterance-length audio, not 10s+ mostly-silent
        streams (whole-stream decoding measured deletion-dominated:
        cp_wer 0.89 with 25-30/32 deletions on the chip vocab
        rehearsal).  The hypothesis->reference speaker assignment
        minimizing total word errors is used (output order is arbitrary
        -> cpWER, not plain WER).  Returns the flat dict for
        metrics.json.
        """
        from tssep_tpu.eval.wer import cp_wer, orc_wer
        est = np.asarray(result['time_estimate'])
        collar = int(0.12 * sample_rate)
        hyps = []
        timed_segments = []   # (start_sample, hyp) across ALL streams
        for spk, stream in enumerate(est):
            dia = result.get('sample_dia')
            if dia is not None and len(dia[spk].normalized_intervals):
                parts = []
                for s, e in dia[spk].normalized_intervals:
                    s = max(0, int(s) - collar)
                    e = min(len(stream), int(e) + collar)
                    h = transcriber(stream[s:e], sample_rate)
                    parts.append(h)
                    if h:
                        timed_segments.append((s, h))
                hyps.append(' '.join(p for p in parts if p))
            else:
                h = transcriber(stream, sample_rate)
                hyps.append(h)
                if h:
                    timed_segments.append((0, h))
        res, assignment = cp_wer(reference_transcripts, hyps,
                                 return_assignment=True)
        out = {f'wer_{k}': v for k, v in res.as_dict().items()}
        out['wer_assignment'] = assignment
        out['cp_wer'] = out.pop('wer_wer')
        # ORC-WER: the same hypotheses as unlabeled temporally-ordered
        # segments, channel attribution chosen by the segment DP (the
        # MeetEval-style second headline WER surface).
        timed_segments.sort(key=lambda t: t[0])
        orc = orc_wer(reference_transcripts,
                      [h for _, h in timed_segments],
                      max_speakers=len(reference_transcripts))
        out['orc_wer'] = orc.error_rate
        return out


def save_wavs(result, out_dir, sample_rate=16000, example_id='recording'):
    """Write per-speaker estimates as WAV files (native codec when built,
    numpy fallback otherwise).  Returns the written paths."""
    from pathlib import Path
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    est = np.asarray(result['time_estimate'], dtype=np.float32)
    from tssep_tpu.runtime import native
    writer = native.wav_write if native.available() else _wav_write_py
    paths = []
    for spk, sig in enumerate(est):
        path = out_dir / f'{example_id}_spk{spk}.wav'
        # A WRITE failure (disk, codec bug) raises; only the unavailable
        # native extension selects the python fallback (above, once).
        writer(path, sig, sample_rate)
        paths.append(path)
    return paths


def _wav_write_py(path, sig, sample_rate):
    import struct
    sig = np.clip(np.asarray(sig, dtype=np.float32), -1, 0.999969)
    pcm = (sig * 32768.0).astype('<i2').tobytes()
    with open(path, 'wb') as f:
        f.write(b'RIFF' + struct.pack('<I', 36 + len(pcm)) + b'WAVE')
        f.write(b'fmt ' + struct.pack('<IHHIIHH', 16, 1, 1, sample_rate,
                                      sample_rate * 2, 2, 16))
        f.write(b'data' + struct.pack('<I', len(pcm)) + pcm)


def calibration_stats(activities, references, thresholds=None,
                      smooth_kernel=11, min_frames=0, merge_gap=0,
                      pad_frames=0):
    """Per-threshold (error, reference) frame totals for the local
    calibration examples.  Returns (thresholds, err, ref) float64 arrays —
    the sufficient statistic for threshold selection, additive across
    hosts."""
    if thresholds is None:
        # Low-end densified: a freq-averaged mask of frequency-sparse
        # speech legitimately peaks well below 0.5, and the silent-frame
        # floor of mask statistics sits near ~1e-3 — the grid must reach
        # below the active-frame scores without touching that floor, or
        # the optimum pins to the grid edge.
        thresholds = np.concatenate([[0.003, 0.005, 0.007],
                                     [0.01, 0.02, 0.03],
                                     np.linspace(0.05, 0.9, 18)])
    err = np.zeros(len(thresholds))
    ref_tot = np.zeros(len(thresholds))
    for i, th in enumerate(thresholds):
        for act, ref in zip(activities, references):
            hyp = np.stack([np.asarray(ai, dtype=bool)
                            for ai in diarize_from_activity(
                                act, th, smooth_kernel, min_frames,
                                merge_gap, pad_frames)])
            ref = np.asarray(ref, dtype=bool)
            frames = min(ref.shape[-1], hyp.shape[-1])
            r = der(ref[..., :frames], hyp[..., :frames])
            err[i] += r['der'] * r['total']
            ref_tot[i] += r['total']
    return np.asarray(thresholds, dtype=np.float64), err, ref_tot


def calibrate_threshold(activities, references, thresholds=None,
                        smooth_kernel=11, min_frames=0, merge_gap=0,
                        pad_frames=0, cross_host=True):
    """Pick the activity threshold minimizing DER over a calibration set.

    activities: list of (spk, frames) scores; references: list of matching
    (spk, frames) boolean frame activities.  This is the diarization
    threshold calibration step (run on the validation/domain-adaptation set
    before eval).  Under a multi-host runtime (``jax.process_count() > 1``)
    the per-threshold (error, total) frame counts from every host's local
    examples are all-reduced before the argmin, so all hosts pick the same
    threshold from the *global* calibration set; single-process this is a
    no-op.  Returns (best_threshold, best_der).
    """
    ths, err, ref_tot = calibration_stats(
        activities, references, thresholds, smooth_kernel, min_frames,
        merge_gap, pad_frames)
    if cross_host:
        import jax
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils
            stacked = np.stack([err, ref_tot])
            summed = multihost_utils.process_allgather(stacked)
            stacked = np.sum(summed, axis=0)
            err, ref_tot = stacked[0], stacked[1]
    ders = err / np.maximum(ref_tot, 1)
    i = int(np.argmin(ders))
    # Plateau-center tie-break: mask-derived activity is near-binary after
    # post-processing, so the DER-vs-threshold curve is typically flat over
    # a wide range and a bare argmin lands on the grid edge (the round-4
    # 'calibrated to 0.01' smell).  Among thresholds within a hair of the
    # minimum, take the middle of the contiguous plateau containing the
    # argmin — maximally robust to calibration/eval distribution shift.
    plateau_tol = ders[i] + max(0.002, 0.01 * ders[i])
    lo = hi = i
    while lo > 0 and ders[lo - 1] <= plateau_tol:
        lo -= 1
    while hi < len(ders) - 1 and ders[hi + 1] <= plateau_tol:
        hi += 1
    i = (lo + hi) // 2
    return float(ths[i]), float(ders[i])
