"""Measure reference-class (torch CPU) training throughput for vs_baseline.

Builds an equivalent torch model for the flagship config — STFT (conv-style
framing + matmul DFT), 8-speaker BLSTM mask estimator with ts-vad stacking,
masking enhancer, LogMAE loss — runs fwd+bwd+Adam steps on CPU, and writes
BASELINE_LOCAL.json.  This is this host's torch capability, the engine class
the reference runs on (it has no GPU here); bench.py reports our TPU
throughput relative to it.
"""
import json, time
from pathlib import Path

import numpy as np
import torch

torch.manual_seed(0)

B, SPK, T_SAMPLES, SR = 4, 8, 80000, 16000
SIZE, SHIFT, F = 1024, 256, 513
UNITS, PROJS, AUX = 300, 320, 513


class TorchFlagship(torch.nn.Module):
    def __init__(self):
        super().__init__()
        n = np.arange(SIZE)[:, None]; k = np.arange(F)[None, :]
        ang = -2 * np.pi * n * k / SIZE
        w = np.hanning(SIZE + 1)[:-1]
        self.register_buffer('cos', torch.tensor((np.cos(ang) * w[:, None]).astype(np.float32)))
        self.register_buffer('sin', torch.tensor((np.sin(ang) * w[:, None]).astype(np.float32)))
        self.pre_lstm = torch.nn.LSTM(F, UNITS, batch_first=True, bidirectional=True)
        self.pre_proj = torch.nn.Linear(2 * UNITS, F)
        self.b0_lstm = torch.nn.LSTM(F, UNITS, batch_first=True, bidirectional=True)
        self.b0_proj = torch.nn.Linear(2 * UNITS, PROJS)
        self.b1_lstm = torch.nn.LSTM(PROJS, UNITS, batch_first=True, bidirectional=True)
        self.b1_proj = torch.nn.Linear(2 * UNITS, PROJS)
        self.b2_lstm = torch.nn.LSTM(PROJS * SPK, UNITS, batch_first=True, bidirectional=True)
        self.b2_proj = torch.nn.Linear(2 * UNITS, PROJS)
        self.head = torch.nn.Linear(PROJS, SPK * F)

    def stft(self, x):  # (B, T) -> (B, frames, F) complex
        frames = x.unfold(-1, SIZE, SHIFT)
        return torch.complex(frames @ self.cos, frames @ self.sin)

    def forward(self, obs, aux):
        X = self.stft(obs)                         # (B, T, F)
        feat = torch.log1p(torch.abs(X))
        h, _ = self.pre_lstm(feat)
        h = self.pre_proj(h)                       # (B, T, F)
        h = h[:, None] * aux[:, :, None, :]        # (B, S, T, F)
        b, s, t, f = h.shape
        h2 = h.reshape(b * s, t, f)
        h2 = torch.tanh(self.b0_proj(self.b0_lstm(h2)[0]))
        h2 = torch.tanh(self.b1_proj(self.b1_lstm(h2)[0]))
        h2 = h2.reshape(b, s, t, -1).transpose(1, 2).reshape(b, t, -1)
        h2 = self.b2_proj(self.b2_lstm(h2)[0])     # (B, T, PROJS)
        logit = self.head(h2).reshape(b, t, s, f).permute(0, 2, 1, 3)
        mask = torch.sigmoid(logit)
        est = X[:, None] * mask                    # (B, S, T, F)
        # istft-equivalent cost: inverse DFT matmul + overlap add approx
        seg = torch.real(est)[..., :F] @ self.cos.T[:F, :] \
            + torch.imag(est) @ self.sin.T[:F, :]
        return mask, seg


def main():
    model = TorchFlagship()
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)
    rng = np.random.RandomState(0)
    obs = torch.tensor(rng.randn(B, T_SAMPLES).astype(np.float32))
    aux = torch.tensor(rng.randn(B, SPK, AUX).astype(np.float32))
    tgt = torch.tensor(rng.randn(B, SPK, T_SAMPLES).astype(np.float32))

    def step():
        opt.zero_grad()
        mask, seg = model(obs, aux)
        # time-domain-equivalent LogMAE on the synthesized frames
        est = seg.reshape(B, SPK, -1)[..., :T_SAMPLES]
        loss = torch.log10(torch.abs(est - tgt).mean(-1).sum(-1)).sum()
        loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 10)
        opt.step()
        return float(loss)

    step()  # warmup
    n = 3
    t0 = time.perf_counter()
    for _ in range(n):
        step()
    el = (time.perf_counter() - t0) / n
    value = B * (T_SAMPLES / SR) / el
    out = {
        'train_audio_seconds_per_second': round(value, 2),
        'engine': f'torch {torch.__version__} CPU ({torch.get_num_threads()} threads)',
        'config': 'flagship-equivalent 8-spk TS-SEP, batch 4, 5s clips',
        'seconds_per_step': round(el, 3),
    }
    Path('BASELINE_LOCAL.json').write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == '__main__':
    main()
