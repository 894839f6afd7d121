"""Synthetic 4K (3840x2160) test clip generator (deterministic).

Same recipe as gen_input_1080.py scaled to UHD - the BASELINE.md
config-5 geometry ("multi-host sharded RA 4K encode"). Raw YUV is far
too large to commit; artifacts reference this generator.
"""
import numpy as np

rng = np.random.RandomState(2160)
W, H, N = 3840, 2160, 5
base_y = (np.add.outer(np.arange(H), np.arange(W)) % 256).astype(np.float32)
tex = rng.randint(0, 25, (H, W)).astype(np.float32)
with open('test_4k.yuv', 'wb') as f:
    for t in range(N):
        y = (0.5 * base_y + tex
             + 40 * np.sin(np.arange(W)[None, :] / 53.0 + t * 0.3)
             + 30 * np.cos(np.arange(H)[:, None] / 37.0 - t * 0.2) + 60)
        bx, by = 400 + 36 * t, 600 + 24 * t
        y[by:by + 288, bx:bx + 288] = 200 - 3 * t
        y = np.clip(y, 0, 255).astype(np.uint8)
        u = np.clip(128 + 30 * np.sin(np.arange(W // 2)[None, :] / 49.0 + t * 0.1)
                    + (np.arange(H // 2)[:, None] % 32), 0, 255).astype(np.uint8)
        v = np.clip(128 - 20 * np.cos(np.arange(W // 2)[None, :] / 79.0 - t * 0.15)
                    + tex[::2, ::2] * 0.5, 0, 255).astype(np.uint8)
        f.write(y.tobytes()); f.write(u.tobytes()); f.write(v.tobytes())
