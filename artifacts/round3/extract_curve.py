"""Extract the (timestep, per-policy test reward) eval curve from a
training log's metrics dumps.  Usage: python extract_curve.py LOG..."""

import re
import sys


def curve(path):
    rows = []
    ts = None
    pol = None
    for line in open(path):
        m = re.search(r"Metrics for policy '(\w+)'", line)
        if m:
            pol = m.group(1)
        m = re.search(r"Current timestep\s*:\s*([\d.]+)", line)
        if m:
            ts = float(m.group(1))
        m = re.search(r"Mean episodic reward \(test\)\s*:\s*(-?[\d.]+)",
                      line)
        if m and pol and ts is not None:
            rows.append((ts, pol, float(m.group(1))))
    out = {}
    for t, p, v in rows:
        out.setdefault(t, {})[p] = v
    return out


if __name__ == "__main__":
    for path in sys.argv[1:]:
        print(f"== {path}")
        c = curve(path)
        for t in sorted(c):
            print(f"{t:>12.0f}  tagger={c[t].get('tagger')}  "
                  f"runner={c[t].get('runner')}")
