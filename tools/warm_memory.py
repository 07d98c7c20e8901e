"""One-time guest-RAM warmer for lazily-provisioned VMs.

This sandbox VM provisions guest pages from the hypervisor on first touch at
~40-100 MB/s (measured), but once-touched pages stay guest-resident and
re-allocate at >5 GB/s even after being freed. Every cold Spark run
otherwise pays the provisioning tax in its shuffle buffers, JVM heap
growth, python Arrow buffers, and tmpfs writes — serializing the whole job
behind a fixed-rate page faucet and masking all scaling. Touch (almost)
all of RAM once, free it, and subsequent workloads run at hardware speed.

Usage: python tools/warm_memory.py [target_gb]   (default: free_mem - 12 GB)
"""
import multiprocessing as mp
import os
import sys
import time


def touch(gb: float) -> float:
    n = int(gb * (1 << 30))
    chunk = bytearray(n)  # zero-filled => every page touched
    # touch one byte per 4k page again to be safe against lazy memset elision
    for i in range(0, n, 4096):
        chunk[i] = 1
    t = time.time()
    del chunk
    return t


def main():
    free_kb = 0
    with open("/proc/meminfo") as f:
        for line in f:
            if line.startswith("MemAvailable:"):
                free_kb = int(line.split()[1])
                break
    target_gb = float(sys.argv[1]) if len(sys.argv) > 1 else max(free_kb / (1 << 20) - 12, 1)
    workers = min(32, os.cpu_count() or 8)
    per = target_gb / workers
    t0 = time.time()
    with mp.Pool(workers) as p:
        p.map(touch, [per] * workers)
    dt = time.time() - t0
    print(f"warmed ~{target_gb:.0f} GB in {dt:.1f}s ({target_gb/dt:.2f} GB/s) with {workers} workers")


if __name__ == "__main__":
    main()
