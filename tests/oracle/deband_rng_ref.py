"""Pure-Python reference for the Deband RNG precompute, written
independently from the algorithm description (reference
src/vapoursynth/deband.zig:149-431) to cross-check the native library."""

from __future__ import annotations

import math

import numpy as np

M32 = 0xFFFFFFFF


def _rand_to_double(rand_num: int) -> float:
    raw = rand_num & M32
    raw = ((raw << 20) | (raw >> 12)) & 0xFFFFFFFFFFFFFFFF
    raw |= 0x3FF0000000000000
    val = np.uint64(raw).view(np.float64) if False else None
    import struct

    val = struct.unpack("<d", struct.pack("<Q", raw))[0]
    return (val - 1.0) * 2.0 - 1.0


class Rng:
    def __init__(self, seed: int):
        self.seed = seed & M32

    def old(self) -> float:
        u = self.seed
        tmp = ((((u << 13) & M32) ^ u) >> 17) ^ ((u << 13) & M32) ^ u
        tmp &= M32
        self.seed = ((32 * tmp) ^ tmp) & M32
        return _rand_to_double(self.seed)

    def uniform(self) -> float:
        self.seed = (1664525 * self.seed + 1013904223) & M32
        return _rand_to_double(self.seed)

    def gaussian(self, param: float) -> float:
        while True:
            while True:
                x = self.uniform()
                y = self.uniform()
                r2 = x * x + y * y
                if r2 <= 1.0 and r2 != 0.0:
                    break
            value = param * y * math.sqrt(-2.0 * math.log(r2) / r2)
            if -1.0 < value < 1.0:
                return value

    def value(self, algo: int, rng: int, param: float) -> int:
        v = [self.old, self.uniform, lambda: self.gaussian(param)][algo]() \
            if algo == 2 else ([self.old, self.uniform][algo]())
        # round half away from zero
        x = v * rng
        return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))

    def value_float(self, algo: int, rng: float, param: float) -> float:
        v = self.gaussian(param) if algo == 2 else (
            self.old() if algo == 0 else self.uniform()
        )
        return np.float32(v * rng)


def _ref_encode(r: int) -> int:
    t = ((r + 128) & 0xFF) - 128  # wrap to i8
    a = abs(t)                     # 0..128
    return ((a + 128) & 0xFF) - 128  # wrap back (128 -> -128)


def precompute_ref(w, h, num_frames, seed, sample_mode, range_, ssw, ssh,
                   algo_ref, algo_grain, param_ref, param_grain, is_float,
                   dynamic, add_grain_y, add_grain_c, grain_y, grain_c):
    useed = (0x92D68CA2 - seed) & M32
    useed ^= ((w << 16) & M32) ^ h
    useed ^= ((num_frames << 16) & M32) ^ num_frames
    rng = Rng(useed)
    mask_w = (1 << ssw) - 1
    mask_h = (1 << ssh) - 1
    cw, ch = w >> ssw, h >> ssh
    out = {k: np.zeros((h, w), np.int32)
           for k in ("ref1_dy", "ref1_dx", "ref2_dy", "ref2_dx")}
    cout = {k: np.zeros((ch, cw), np.int32)
            for k in ("c_ref1_dy", "c_ref1_dx", "c_ref2_dy", "c_ref2_dx")}
    for y in range(h):
        cx = 0
        for x in range(w):
            rng.value(algo_grain, 1, param_grain)
            x_range = min(range_, x, w - x - 1)
            y_range = min(range_, y, h - y - 1)
            if sample_mode == 1:
                cur = y_range
            elif sample_mode == 3:
                cur = x_range
            else:
                cur = min(x_range, y_range)
            val1 = val2 = 0
            if cur > 0:
                val1 = _ref_encode(rng.value(algo_ref, cur, param_ref))
                if sample_mode == 2:
                    val2 = _ref_encode(rng.value(algo_ref, cur, param_ref))
            if sample_mode == 1:
                out["ref1_dy"][y, x] = val1
            elif sample_mode == 2:
                out["ref1_dy"][y, x] = val2
                out["ref1_dx"][y, x] = val1
                out["ref2_dy"][y, x] = -val1
                out["ref2_dx"][y, x] = val2
            elif sample_mode == 3:
                out["ref1_dx"][y, x] = val1
            else:
                out["ref1_dy"][y, x] = val1
                out["ref2_dx"][y, x] = val1
            if (x & mask_w) == 0 and (y & mask_h) == 0:
                v1w, v1h = val1 >> ssw, val1 >> ssh
                v2w, v2h = val2 >> ssw, val2 >> ssh
                cy = y >> ssh
                if sample_mode == 1:
                    cout["c_ref1_dy"][cy, cx] = v1h
                elif sample_mode == 2:
                    cout["c_ref1_dy"][cy, cx] = v2h
                    cout["c_ref1_dx"][cy, cx] = v1w
                    cout["c_ref2_dy"][cy, cx] = -v1h
                    cout["c_ref2_dx"][cy, cx] = v2w
                elif sample_mode == 3:
                    cout["c_ref1_dx"][cy, cx] = v1w
                else:
                    cout["c_ref1_dy"][cy, cx] = v1h
                    cout["c_ref2_dx"][cy, cx] = v1w
                rng.value(algo_grain, 1, param_grain)
                rng.value(algo_grain, 1, param_grain)
                cx += 1

    item_count = ((w + 255) & ~127) * h
    total = item_count * (3 if dynamic else 1)
    res = {**out, **cout, "item_count": item_count}
    for p, add in ((0, add_grain_y), (1, add_grain_c)):
        key = "grain_y" if p == 0 else "grain_c"
        if not add:
            for _ in range(total):
                rng.value(algo_grain, 0, param_grain)
            res[key] = np.zeros(1, np.float32 if is_float else np.int16)
            continue
        if is_float:
            g = np.zeros(total, np.float32)
            gr = grain_y if p == 0 else grain_c
            for i in range(total):
                g[i] = rng.value_float(algo_grain, gr, param_grain)
        else:
            g = np.zeros(total, np.int16)
            gr = grain_y if p == 0 else grain_c
            for i in range(total):
                g[i] = rng.value(algo_grain, gr, param_grain)
        res[key] = g
    if dynamic:
        offs = np.zeros(num_frames, np.uint32)
        for n in range(num_frames):
            offs[n] = (item_count + rng.value(1, item_count, 1.0)) & 0xFFFFFFF0
        res["grain_offsets"] = offs
    return res
