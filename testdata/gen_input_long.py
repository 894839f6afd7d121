"""Synthetic 33-frame CIF clip (deterministic): long enough for two
full RA16 dyadic sub-GOPs, so the GOP-parallel dependency levels of the
sharded decoder contain real multi-frame batches (test_cif.yuv is only
10 frames, below one sub-GOP, and degrades RA16 to sequential coding).
Same recipe as gen_input.py."""
import numpy as np

rng = np.random.RandomState(42)
W, H, N = 352, 288, 33
base_y = (np.add.outer(np.arange(H), np.arange(W)) % 256).astype(np.float32)
tex = rng.randint(0, 25, (H, W)).astype(np.float32)
with open('test_cif_long.yuv', 'wb') as f:
    for t in range(N):
        y = (0.5 * base_y + tex
             + 40 * np.sin(np.arange(W)[None, :] / 23.0 + t * 0.3)
             + 30 * np.cos(np.arange(H)[:, None] / 17.0 - t * 0.2) + 60)
        bx, by = (10 + 6 * t) % (W - 48), (20 + 4 * t) % (H - 48)
        y[by:by + 48, bx:bx + 48] = 200 - 2 * t
        y = np.clip(y, 0, 255).astype(np.uint8)
        u = np.clip(128 + 30 * np.sin(np.arange(W // 2)[None, :] / 19.0
                                      + t * 0.1)
                    + (np.arange(H // 2)[:, None] % 32), 0, 255) \
            .astype(np.uint8)
        v = np.clip(128 - 20 * np.cos(np.arange(W // 2)[None, :] / 29.0
                                      - t * 0.15)
                    + tex[::2, ::2] * 0.5, 0, 255).astype(np.uint8)
        f.write(y.tobytes())
        f.write(u.tobytes())
        f.write(v.tobytes())
