#!/usr/bin/env python3
"""Per-core throughput vs occupancy width — the measurement floor probe.

Runs an identical pure-ALU loop on 1 process and on all-N processes and
reports the wall ratio. On this harness the all-width pass runs ~1.4-1.5x
slower per core than the single-width pass with ~0% steal and ~0% system
time (all-core frequency / SMT sharing), so CPU-second ratios across a
x10 data decade land at 10x * (up to ~1.5) =~ 13-17x for CPU-bound
queries whose small-SF run is too short to hold full width - an
environmental constant, not a plan term. See DESIGN.md section 4o.
"""
import os
import time
import multiprocessing as mp

ITERS = 12_000_000


def burn(_q):
    x = 0
    for _ in range(ITERS):
        x = (x * 1103515245 + 12345) & 0xffffffff
    _q.put(x)


def stat():
    f = open('/proc/stat').readline().split()
    return list(map(int, f[1:9]))


def run(nproc):
    q = mp.Queue()
    ps = [mp.Process(target=burn, args=(q,)) for _ in range(nproc)]
    a = stat()
    t0 = time.time()
    for p in ps:
        p.start()
    for p in ps:
        p.join()
    wall = time.time() - t0
    d = [y - x for x, y in zip(a, stat())]
    tot = sum(d) or 1
    names = ['user', 'nice', 'sys', 'idle', 'iow', 'irq', 'sirq', 'steal']
    shares = {n: round(100.0 * v / tot, 1) for n, v in zip(names, d)
              if v > tot * 0.005}
    return wall, shares


def main():
    ncpu = os.cpu_count()
    w1, s1 = run(1)
    wN, sN = run(ncpu)
    print(f"single-width: {w1:.2f} s  {s1}")
    print(f"all-{ncpu}-width: {wN:.2f} s  {sN}")
    print(f"per-core slowdown at full width: {wN / w1:.2f}x")


if __name__ == '__main__':
    main()
