"""No-Spark probe: does local-socket streaming between process pairs scale
on this host? P (writer, reader) pairs all pinned to CPUs 0..P-1 (the same
oversubscription shape as P Spark task threads + P Python workers under
taskset), each pair streaming `total_mb` MB through a loopback TCP socket in
`chunk_kb` KB writes. Prints per-level aggregate throughput and 2->8 scaling.
"""

import multiprocessing as mp
import os
import socket
import sys
import time

CHUNK_KB = int(os.environ.get("CHUNK_KB", "64"))
TOTAL_MB = int(os.environ.get("TOTAL_MB", "512"))


def reader(port, procs, ready, done):
    os.sched_setaffinity(0, set(range(procs)))
    srv = socket.socket()
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", port))
    srv.listen(1)
    ready.set()
    conn, _ = srv.accept()
    n = 0
    target = TOTAL_MB << 20
    while n < target:
        b = conn.recv(1 << 20)
        if not b:
            break
        n += len(b)
    conn.close()
    srv.close()
    done.set()


def writer(port, procs):
    os.sched_setaffinity(0, set(range(procs)))
    c = socket.socket()
    c.connect(("127.0.0.1", port))
    chunk = b"x" * (CHUNK_KB << 10)
    n = 0
    target = TOTAL_MB << 20
    while n < target:
        c.sendall(chunk)
        n += len(chunk)
    c.close()


def run_level(procs, base_port):
    ctx = mp.get_context("spawn")
    readies, dones, rs, ws = [], [], [], []
    for i in range(procs):
        ready, done = ctx.Event(), ctx.Event()
        r = ctx.Process(target=reader, args=(base_port + i, procs, ready, done))
        r.start()
        readies.append(ready)
        dones.append(done)
        rs.append(r)
    for e in readies:
        e.wait()
    t0 = time.time()
    for i in range(procs):
        w = ctx.Process(target=writer, args=(base_port + i, procs))
        w.start()
        ws.append(w)
    for e in dones:
        e.wait()
    el = time.time() - t0
    for p in rs + ws:
        p.join()
    return procs * TOTAL_MB / el  # aggregate MB/s


def main():
    res = {}
    for procs in (2, 8, 2, 8):
        thr = run_level(procs, 41000 + procs * 16)
        res.setdefault(procs, []).append(thr)
        print(f"{procs} pairs: {thr:,.0f} MB/s aggregate")
    eff = max(res[8]) / (4 * max(res[2]))
    print(f"scaling efficiency 2->8 pairs: {eff:.3f}")


if __name__ == "__main__":
    main()
