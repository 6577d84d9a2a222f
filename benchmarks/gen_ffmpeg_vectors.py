#!/usr/bin/env python
"""Generate tests/ffmpeg_vectors/xpsnr.json on a machine that has an
ffmpeg build with the xpsnr filter.

Usage:  python benchmarks/gen_ffmpeg_vectors.py

For every case in tests/test_xpsnr_ffmpeg.py CASES, builds the
deterministic (reference, distorted) pair, dumps both to lossless y4m,
runs FFmpeg's vf_xpsnr via the metadata filter, and stores the per-frame
{y,u,v} rows.  Once the JSON is committed, the oracle tests in
tests/test_xpsnr_ffmpeg.py run WITHOUT ffmpeg (baked mode) — an
independent frame-for-frame witness for the >HD b_val==2 and fps>=32
2nd-order regimes, mirroring the reference's opt-in FFmpeg oracle
(reference tests/test_xpsnr_ffmpeg.py).
"""

import json
import sys
import tempfile
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "tests"))


def main():
    import test_xpsnr_ffmpeg as T

    if T._ffmpeg() is None:
        sys.exit("ffmpeg with the xpsnr filter is required on PATH")
    out = {}
    with tempfile.TemporaryDirectory() as td:
        for geom, fmt, fps in T.CASES:
            key = f"{geom}-{fmt}-fps{fps}"
            ref, dist = T.build_pair(geom, fmt, fps)
            rp, dp = Path(td) / "ref.y4m", Path(td) / "dist.y4m"
            T.dump_y4m(ref, rp, fps)
            T.dump_y4m(dist, dp, fps)
            out[key] = T.ffmpeg_xpsnr(rp, dp)
            print(f"{key}: {len(out[key])} frames", flush=True)
    dst = ROOT / "tests" / "ffmpeg_vectors"
    dst.mkdir(exist_ok=True)
    (dst / "xpsnr.json").write_text(json.dumps(out, indent=1))
    print(f"wrote {dst / 'xpsnr.json'}")


if __name__ == "__main__":
    main()
