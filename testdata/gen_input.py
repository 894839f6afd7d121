"""Synthetic CIF test clip generator (deterministic)."""
import numpy as np
rng = np.random.RandomState(42)
W, H, N = 352, 288, 10
frames = []
base_y = (np.add.outer(np.arange(H), np.arange(W)) % 256).astype(np.float32)
tex = rng.randint(0, 25, (H, W)).astype(np.float32)
for t in range(N):
    y = 0.5*base_y + tex + 40*np.sin(np.arange(W)[None,:]/23.0 + t*0.3) + 30*np.cos(np.arange(H)[:,None]/17.0 - t*0.2) + 60
    bx, by = 40 + 6*t, 60 + 4*t
    y[by:by+48, bx:bx+48] = 200 - 3*t
    y = np.clip(y, 0, 255).astype(np.uint8)
    u = np.clip(128 + 30*np.sin(np.arange(W//2)[None,:]/19.0 + t*0.1) + (np.arange(H//2)[:,None] % 32), 0, 255).astype(np.uint8)
    v = np.clip(128 - 20*np.cos(np.arange(W//2)[None,:]/29.0 - t*0.15) + tex[::2,::2]*0.5, 0, 255).astype(np.uint8)
    frames.append((y, u, v))
with open('test_cif.yuv', 'wb') as f:
    for y, u, v in frames:
        f.write(y.tobytes()); f.write(u.tobytes()); f.write(v.tobytes())
