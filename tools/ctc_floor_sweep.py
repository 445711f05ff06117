"""Recognizer-floor sweep: reverberated-speech cpWER floor vs CTC config.

The round-5 cpWER decomposition (tools/diagnose_cpwer.py, TPU_R5G/N)
established that the joint pipeline's cpWER is floored by the CTC
recognizer's intrinsic reverberated-speech WER (~0.336 on oracle-clean
streams) — the separation share is ~zero.  So the next cpWER win lives
entirely in the recognizer.  This tool measures that floor DIRECTLY:

  oracle-clean streams (per-speaker ``speaker_reverberation_early_ch0``)
  + oracle diarization -> segment-wise CTC decode -> cpWER

for a grid of recognizer training configs, WITHOUT retraining any
separation model.  Conditions match the rehearsal exactly
(``exp/run_simulated.py``): eval corpus = MeetingSimulator(duration=10,
seed=2, num_channels=6, reverb_taps=2, speaker_pool=16, vocabulary=8)
— the same eval examples the TPU_R5W record scored — and the recognizer
training simulator uses seed=3 as the recipe does.

A variant that clearly beats the shipped floor earns its knobs as the
recipe's ``ctc_*`` defaults.  (Reference scope note: the reference repo
delegates ASR scoring to its companion repo, ``README.md:79-82``; the
recognizer and this floor harness are this framework's in-repo WER
surface.)

Usage:
    python tools/ctc_floor_sweep.py [--eval_examples=8] \
        [--variants=base,long,wide] [--out=log/ctc_floor_sweep.json]
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

#: Each variant = CTCRecognizer.train_on kwargs on top of the recipe's
#: call (exp/run_simulated.py:195: train_on(asr_sim, steps=ctc_steps)).
VARIANTS = {
    # the shipped recipe configuration (ctc_steps=900 default)
    'base': dict(steps=900),
    # longer schedule x bigger corpus: 768 utterances = 768 reverb draws;
    # more draws marginalize the tap distribution better
    'long': dict(steps=2400, corpus_size=2048),
    # + model capacity (units/projs 48 -> 96)
    'wide': dict(steps=2400, corpus_size=2048, units=96, projs=96),
    # + temporal context per CTC frame (3 -> 5 stacked mel frames):
    # reverb fills the inter-pulse gaps that carry word identity; a wider
    # receptive field sees past the smear
    'ctx5': dict(steps=2400, corpus_size=2048, subsample=5),
    # capacity + context combined
    'wide_ctx5': dict(steps=2400, corpus_size=2048, units=96, projs=96,
                      subsample=5),
}


def build_eval_set(eval_examples=8, duration=5.0, num_channels=6,
                   reverb_taps=2, speaker_pool=16, vocabulary=8,
                   aux_size=513):
    """The rehearsal's eval meetings (seed=2, 2x duration), in memory."""
    from tssep_tpu.data.simulate import MeetingSimulator
    sim = MeetingSimulator(
        duration=duration * 2, aux_size=aux_size, seed=2,
        embedding_kind='gate', num_channels=num_channels,
        reverb_taps=reverb_taps, speaker_pool=speaker_pool,
        vocabulary=vocabulary)
    return [sim.example(i) for i in range(eval_examples)]


def score_floor(examples, transcriber):
    """Mean oracle-clean cpWER (+ deletion share) over the eval set."""
    from tssep_tpu.eval.driver import EvalDriver
    from tssep_tpu.signal.intervals import ArrayInterval
    rows = []
    for ex in examples:
        audio = ex.get('audio_data', ex)
        tgt = np.asarray(audio['speaker_reverberation_early_ch0'])
        vad = np.asarray(audio['vad'], dtype=bool)
        result = {
            'time_estimate': tgt,
            'sample_dia': [ArrayInterval(row) for row in vad],
        }
        out = EvalDriver.score_wer(None, result, ex['transcription'],
                                   transcriber)
        rows.append(out)
    n = float(len(rows))
    return {
        'mean_cp_wer': sum(r['cp_wer'] for r in rows) / n,
        'mean_orc_wer': sum(r['orc_wer'] for r in rows) / n,
        'deletions': sum(r['wer_deletions'] for r in rows),
        'substitutions': sum(r['wer_substitutions'] for r in rows),
        'insertions': sum(r['wer_insertions'] for r in rows),
        'length': sum(r['wer_length'] for r in rows),
        'per_recording_cp_wer': [r['cp_wer'] for r in rows],
    }


def main(eval_examples=8, variants=None, out='log/ctc_floor_sweep.json',
         duration=5.0, reverb_taps=2, speaker_pool=16, vocabulary=8):
    from tssep_tpu.data.simulate import MeetingSimulator
    from tssep_tpu.eval.ctc import CTCRecognizer

    names = (variants.split(',') if isinstance(variants, str)
             else list(VARIANTS))
    print(f'Building eval set ({eval_examples} meetings, seed=2, '
          f'taps={reverb_taps})', flush=True)
    examples = build_eval_set(eval_examples, duration=duration,
                              reverb_taps=reverb_taps,
                              speaker_pool=speaker_pool,
                              vocabulary=vocabulary)
    # recipe's recognizer-training simulator (exp/run_simulated.py:186)
    asr_sim = MeetingSimulator(
        duration=duration, aux_size=513, seed=3, embedding_kind='gate',
        speaker_pool=speaker_pool, vocabulary=vocabulary,
        reverb_taps=reverb_taps)

    results = {}
    for name in names:
        kw = VARIANTS[name]
        t0 = time.time()
        print(f'=== variant {name}: train_on({kw})', flush=True)
        asr = CTCRecognizer.train_on(asr_sim, verbose=True, **kw)
        train_s = time.time() - t0
        t0 = time.time()
        floor = score_floor(examples, asr)
        floor['train_seconds'] = round(train_s, 1)
        floor['score_seconds'] = round(time.time() - t0, 1)
        floor['config'] = kw
        results[name] = floor
        print(f'--- {name}: floor cpWER {floor["mean_cp_wer"]:.4f} '
              f'(del {floor["deletions"]}/{floor["length"]}, '
              f'sub {floor["substitutions"]}, ins {floor["insertions"]}) '
              f'train {train_s:.0f}s', flush=True)

    best = min(results, key=lambda k: results[k]['mean_cp_wer'])
    summary = {'eval_examples': eval_examples, 'results': results,
               'best': best,
               'best_cp_wer': results[best]['mean_cp_wer']}
    print('SUMMARY', json.dumps(
        {k: round(v['mean_cp_wer'], 4) for k, v in results.items()}
        | {'best': best}))
    out = Path(out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(summary, indent=1))
    print(f'wrote {out}')
    return summary


if __name__ == '__main__':
    kw = {}
    for a in sys.argv[1:]:
        if a.startswith('--') and '=' in a:
            k, _, v = a[2:].partition('=')
            for coerce in (int, float):
                try:
                    v = coerce(v)
                    break
                except ValueError:
                    pass
            kw[k] = v
    main(**kw)
