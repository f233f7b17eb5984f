#!/usr/bin/env python
"""Aggregate per-frame 'duration: N ms' log lines
(Tools/Benchmarks/Process/process.js equivalent: avg + max)."""
import re
import sys


def main():
    samples = []
    for line in sys.stdin:
        m = re.search(r"duration:\s*([\d.]+)\s*ms", line)
        if m:
            samples.append(float(m.group(1)))
    if not samples:
        print("no samples")
        return
    print(f"avg: {sum(samples) / len(samples):.2f} ms")
    print(f"max: {max(samples):.2f} ms")


if __name__ == "__main__":
    main()
