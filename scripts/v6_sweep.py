"""Sequential on-chip sweep of v6 decoder variants (one subprocess each —
the D2_* probe flags are read at module import).  Results append to
/tmp/v6_sweep.jsonl.  Run with the default env (axon TPU); takes ~5 min of
compile per variant.

Usage: python scripts/v6_sweep.py [variant ...]   (default: the full list)
"""
import os
import subprocess
import sys

VARIANTS = {
    "base": {},
    "nofetch": {"D2_NOFETCH": "1"},
    "note": {"D2_NOTE": "1"},
    "wq16cq16": {"D2_WQ": "16", "D2_CQ": "16"},
    "every": {"D2_EVERY": "1"},
    "single": {"D2_SINGLE": "1"},
    "uin8": {"D2_UIN": "8"},
    "u32": {"D2_U": "32", "D2_UIN": "16"},
    "body1": {"D2_BODY": "1"},
    "body3": {"D2_BODY": "3"},
    "now": {"D2_NOW": "1"},
    "noc": {"D2_NOC": "1"},
    "nos": {"D2_NOS": "1"},
    "nocond": {"D2_NOCOND": "1"},
    "nofar": {"D2_NOFAR": "1"},
    "greedy": {"D2_GREEDY": "1"},
    "greedy_u8": {"D2_GREEDY": "1", "D2_U": "8", "D2_UIN": "8"},
    "greedy_cf2": {"D2_GREEDY": "1", "D2_CF2": "1"},
    "greedy_cq64": {"D2_GREEDY": "1", "D2_CQ": "64"},
    "greedy_cq48": {"D2_GREEDY": "1", "D2_CQ": "48"},
}


def main():
    names = sys.argv[1:] or list(VARIANTS)
    out = open("/tmp/v6_sweep.jsonl", "a")
    for nm in names:
        env = dict(os.environ)
        env.update(VARIANTS[nm])
        env["V6_NAME"] = nm
        print(f"=== {nm} ===", flush=True)
        r = subprocess.run(
            [sys.executable, "/root/repo/scripts/v6_variant.py"],
            env=env, capture_output=True, text=True, timeout=1200)
        line = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else ""
        if r.returncode != 0 or not line.startswith("{"):
            line = f'{{"variant": "{nm}", "error": true}}'
            print(r.stderr[-2000:], flush=True)
        print(line, flush=True)
        out.write(line + "\n")
        out.flush()


if __name__ == "__main__":
    main()
