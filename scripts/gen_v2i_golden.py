#!/usr/bin/env python3
"""Generate the VectorToImage golden fixture (dev tooling, run once).

Independent numpy implementation of the same architecture as
graft.ops.Multimodal.v2iForward (train.py:5-70 at reduced resolution,
BatchNorm folded): dense d->hidden->cIn*g^2 with ReLU, reshape (cIn,g,g),
3x3 same conv + ReLU, bilinear x2 then to (out,out) (align_corners=False),
1x1 conv head, sigmoid. Writes weights + inputs + expected pixels to
src/test/resources/fixtures/v2i_golden.json; MultimodalSpec asserts the
Spark-side forward matches to float precision.
"""
import json
import numpy as np

rng = np.random.default_rng(20260814)
D, H, CIN, CMID, G, OUT = 6, 8, 3, 2, 4, 10

w1 = rng.uniform(-0.5, 0.5, (H, D))
b1 = rng.uniform(-0.1, 0.1, H)
w2 = rng.uniform(-0.3, 0.3, (CIN * G * G, H))
b2 = rng.uniform(-0.1, 0.1, CIN * G * G)
conv3 = rng.uniform(-0.4, 0.4, (CMID, CIN, 3, 3))
b3 = rng.uniform(-0.1, 0.1, CMID)
head = rng.uniform(-1.0, 1.0, CMID)
headB = float(rng.uniform(-0.1, 0.1))

inputs = rng.uniform(-2.0, 2.0, (3, D))


def bilinear(src, oh, ow):
    h, w = src.shape
    out = np.empty((oh, ow))
    for oy in range(oh):
        sy = min(max((oy + 0.5) * h / oh - 0.5, 0.0), h - 1.0)
        y0, fy = int(sy), sy - int(sy)
        y1 = min(y0 + 1, h - 1)
        for ox in range(ow):
            sx = min(max((ox + 0.5) * w / ow - 0.5, 0.0), w - 1.0)
            x0, fx = int(sx), sx - int(sx)
            x1 = min(x0 + 1, w - 1)
            out[oy, ox] = (src[y0, x0] * (1 - fy) * (1 - fx)
                           + src[y0, x1] * (1 - fy) * fx
                           + src[y1, x0] * fy * (1 - fx)
                           + src[y1, x1] * fy * fx)
    return out


def forward(x):
    z1 = np.maximum(w1 @ x + b1, 0.0)
    z2 = np.maximum(w2 @ z1 + b2, 0.0).reshape(CIN, G, G)
    padded = np.pad(z2, ((0, 0), (1, 1), (1, 1)))
    mid = np.empty((CMID, G, G))
    for co in range(CMID):
        acc = np.full((G, G), b3[co])
        for ci in range(CIN):
            for ky in range(3):
                for kx in range(3):
                    acc += conv3[co, ci, ky, kx] * \
                        padded[ci, ky:ky + G, kx:kx + G]
        mid[co] = np.maximum(acc, 0.0)
    up = np.stack([bilinear(bilinear(mid[c], 2 * G, 2 * G), OUT, OUT)
                   for c in range(CMID)])
    logits = np.tensordot(head, up, axes=1) + headB
    return 1.0 / (1.0 + np.exp(-logits))


fix = {
    "grid": G, "outSize": OUT,
    "w1": w1.tolist(), "b1": b1.tolist(),
    "w2": w2.tolist(), "b2": b2.tolist(),
    "conv3": conv3.tolist(), "b3": b3.tolist(),
    "head": head.tolist(), "headB": headB,
    "inputs": inputs.tolist(),
    "expected": [forward(x).flatten().tolist() for x in inputs],
}
path = "src/test/resources/fixtures/v2i_golden.json"
with open(path, "w") as f:
    json.dump(fix, f)
print(path, "written;",
      [round(float(np.mean(e)), 6) for e in
       [forward(x) for x in inputs]])
