"""Re-score an already-trained multichannel rehearsal (egs/simulated_mc)
with the current eval harness — no retraining.

Round-4 use: the 10:24 chip rehearsal trained cleanly (TS-VAD held-out
DER 0.0106; TS-SEP validation LogMAE -0.82) but the TS-SEP eval derived
activity as sigmoid(freq-mean logit), which collapses for 'tf' resolution
(frequency-sparse speech) — DER 0.65 from misses.  This re-runs all three
evals with the fixed freq-mean-of-mask statistic against the SAME
checkpoints and prints the masking-vs-MVDR comparison.

Usage: python tools/reeval_mc.py [work_dir] [out_suffix]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(work_dir='egs/simulated_mc', suffix='_reeval'):
    from tssep_tpu.config.configurable import from_config
    from tssep_tpu.eval.run import evaluate
    from tssep_tpu.exp.run_simulated import _config
    from tssep_tpu.train.experiment import Experiment

    work_dir = Path(work_dir)
    shards = {s: work_dir / f'{s}.shard'
              for s in ('train', 'validate', 'eval')}
    for p in shards.values():
        assert p.exists(), p

    # Word-vocabulary run (ctc_asr.npz saved by run_simulated): score
    # cpWER with the trained recognizer and bridge in-turn word gaps.
    transcriber = None
    overrides = None
    asr_path = work_dir / 'ctc_asr.npz'
    if asr_path.exists():
        from tssep_tpu.eval.ctc import CTCRecognizer
        transcriber = CTCRecognizer().load(asr_path)
        overrides = {'merge_gap_frames': int(0.45 * 16000 / 256) + 1}
        print(f'Loaded CTC recognizer from {asr_path}; '
              f'merge_gap_frames={overrides["merge_gap_frames"]}')

    cfg = _config(work_dir, shards, 'tsvad', 800, 8, 513)
    eg = from_config(Experiment.get_config(cfg))
    print('=== Re-eval: TS-VAD (diarization)')
    vad_metrics = evaluate(
        eg, beamform=False, driver_overrides=overrides,
        out=work_dir / 'tsvad' / f'eval{suffix}')

    ckpt = work_dir / 'tsvad' / 'checkpoints' / 'ckpt_best_loss.npz'
    cfg2 = _config(work_dir, shards, 'tssep', 800, 8, 513, checkpoint=ckpt)
    eg2 = from_config(Experiment.get_config(cfg2))
    import os
    joint = os.environ.get('TSSEP_REEVAL_JOINT', '0') != '0'
    dia_eg = eg if joint else None
    pm = float(os.environ.get('TSSEP_REEVAL_POSTMASK', '0') or 0)
    if pm:
        from tssep_tpu.eval.classic_bf import ClassicBF
        overrides = dict(overrides or {})
        overrides['enhancer'] = ClassicBF(masking=True, masking_eps=pm)
        print(f'MVDR post-mask floor eps={pm}')
    print(f'=== Re-eval: TS-SEP (masking){" [joint dia]" if joint else ""}')
    sep_metrics = evaluate(
        eg2, beamform=False, transcriber=transcriber,
        driver_overrides=overrides, dia_eg=dia_eg,
        out=work_dir / 'tssep' / f'eval{suffix}')
    print(f'=== Re-eval: TS-SEP (MVDR){" [joint dia]" if joint else ""}')
    bf_metrics = evaluate(
        eg2, beamform=True, transcriber=transcriber,
        driver_overrides=overrides, dia_eg=dia_eg,
        out=work_dir / 'tssep' / f'eval_bf{suffix}')
    cmp = {
        'masking_si_sdr': sep_metrics['summary'].get('mean_si_sdr'),
        'mvdr_si_sdr': bf_metrics['summary'].get('mean_si_sdr'),
        'tsvad_der': vad_metrics['summary'].get('mean_der'),
        'tssep_der': sep_metrics['summary'].get('mean_der'),
        'masking_cp_wer': sep_metrics['summary'].get('mean_cp_wer'),
        'mvdr_cp_wer': bf_metrics['summary'].get('mean_cp_wer'),
    }
    print('=== Masking vs MVDR (re-eval):', cmp)
    return cmp


if __name__ == '__main__':
    args = [a for a in sys.argv[1:] if not a.startswith('-')]
    main(*args[:2])
