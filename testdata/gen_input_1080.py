"""Synthetic 1080p test clip generator (deterministic).

Same recipe as gen_input.py scaled to 1920x1080: smooth gradients +
texture + moving block, so the encoder exercises intra, inter, and
filter paths with realistic residual statistics. The raw YUV and the
reference decode are too large to commit; tests/bench compare against
the committed SHA-256 of the reference Thordec output instead
(see regen_1080.sh).
"""
import numpy as np

rng = np.random.RandomState(1080)
W, H, N = 1920, 1080, 17
base_y = (np.add.outer(np.arange(H), np.arange(W)) % 256).astype(np.float32)
tex = rng.randint(0, 25, (H, W)).astype(np.float32)
with open('test_1080.yuv', 'wb') as f:
    for t in range(N):
        y = (0.5 * base_y + tex
             + 40 * np.sin(np.arange(W)[None, :] / 53.0 + t * 0.3)
             + 30 * np.cos(np.arange(H)[:, None] / 37.0 - t * 0.2) + 60)
        bx, by = 200 + 18 * t, 300 + 12 * t
        y[by:by + 144, bx:bx + 144] = 200 - 3 * t
        y = np.clip(y, 0, 255).astype(np.uint8)
        u = np.clip(128 + 30 * np.sin(np.arange(W // 2)[None, :] / 49.0 + t * 0.1)
                    + (np.arange(H // 2)[:, None] % 32), 0, 255).astype(np.uint8)
        v = np.clip(128 - 20 * np.cos(np.arange(W // 2)[None, :] / 79.0 - t * 0.15)
                    + tex[::2, ::2] * 0.5, 0, 255).astype(np.uint8)
        f.write(y.tobytes()); f.write(u.tobytes()); f.write(v.tobytes())
