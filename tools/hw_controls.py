#!/usr/bin/env python3
"""Hardware ceiling controls for the N->4N scaling protocol.

Two controls, independent of the JVM/Spark/engine:
  cpu  — fixed total integer work split across P processes: what speedup
         can ANY software get from P -> 4P cores on this VM?
  io   — fixed total bytes written+read across P writer/reader processes
         on the local disk: does disk bandwidth scale with threads?

Usage: hw_controls.py [cpu|io|both] [pairs like 2,8 8,32]
"""
import multiprocessing as mp
import os, sys, time, tempfile, shutil


def _cpu_work(n):
    s = 0
    for i in range(n):
        s += i * i
    return s


def cpu_rate(procs, total=240_000_000):
    chunk = total // procs
    t0 = time.time()
    with mp.Pool(procs) as p:
        p.map(_cpu_work, [chunk] * procs)
    return total / (time.time() - t0)


def _io_work(args):
    path, nbytes = args
    blk = b"x" * (1 << 20)
    with open(path, "wb") as f:
        for _ in range(nbytes >> 20):
            f.write(blk)
        f.flush()
        os.fsync(f.fileno())
    seen = 0
    with open(path, "rb") as f:
        while True:
            b = f.read(1 << 20)
            if not b:
                break
            seen += len(b)
    os.unlink(path)
    return seen


def io_rate(procs, total=8 << 30):
    d = tempfile.mkdtemp(prefix="ioctl")
    per = total // procs
    try:
        t0 = time.time()
        with mp.Pool(procs) as p:
            p.map(_io_work, [(os.path.join(d, f"f{i}"), per)
                             for i in range(procs)])
        return total / (time.time() - t0)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    pairs = [tuple(map(int, a.split(","))) for a in sys.argv[2:]] or \
        [(2, 8), (8, 32)]
    levels = sorted({x for p in pairs for x in p})
    if which in ("cpu", "both"):
        r = {p: cpu_rate(p) for p in levels}
        for a, b in pairs:
            print(f"cpu {a}->{b}: {r[a]:,.0f} -> {r[b]:,.0f} ops/s "
                  f"speedup {r[b]/r[a]:.2f}x eff {r[b]/r[a]/(b/a):.2f}")
    if which in ("io", "both"):
        r = {p: io_rate(p) for p in levels}
        for a, b in pairs:
            print(f"io  {a}->{b}: {r[a]/2**30:.2f} -> {r[b]/2**30:.2f} GiB/s "
                  f"speedup {r[b]/r[a]:.2f}x eff {r[b]/r[a]/(b/a):.2f}")


if __name__ == "__main__":
    main()
