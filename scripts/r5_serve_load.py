"""Round-5 TPU serving under concurrent load (VERDICT r4 #3).

Starts `--serve` with warmup (which now also pre-compiles the
power-of-two micro-batch executables), then measures:
  (1) sequential baseline: 10 requests one at a time;
  (2) concurrent: 8 client threads x 4 requests each — aggregate
      requests/s and the batched_n distribution (proof the coalescing
      engaged on hardware).

Kills the exact child PID on exit (never pkill by pattern).

Run:
  cd /root/repo && nohup setsid env PYTHONPATH=/root/repo:/root/.axon_site \
    python scripts/r5_serve_load.py > /tmp/r5_serve_load.log 2>&1 &
"""

import base64
import collections
import json
import os
import signal
import subprocess
import sys
import threading
import time
import urllib.request

PORT = 8157
D = "/root/reference/stereo_matching_cuda/data"

env = dict(os.environ)
env["PYTHONPATH"] = "/root/repo:/root/.axon_site"

srv = subprocess.Popen(
    [sys.executable, "-m", "stereo_matching_cuda_tpu",
     "--serve", str(PORT), "--serve-warmup", "288x384"],
    stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    start_new_session=True, env=env)
print(f"server pid {srv.pid}", flush=True)

try:
    t0 = time.time()
    deadline = t0 + 1800
    while time.time() < deadline:
        try:
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{PORT}/healthz", timeout=5) as r:
                h = json.loads(r.read())
                break
        except Exception:
            if srv.poll() is not None:
                print("server died:", srv.stdout.read()[-3000:], flush=True)
                sys.exit(1)
            time.sleep(2)
    else:
        raise SystemExit("healthz never came up")
    print(f"healthz after {time.time()-t0:.1f}s: {h}", flush=True)

    body = json.dumps({
        "left": base64.b64encode(
            open(f"{D}/tsukuba0.png", "rb").read()).decode(),
        "right": base64.b64encode(
            open(f"{D}/tsukuba1.png", "rb").read()).decode(),
    }).encode()

    def post():
        req = urllib.request.Request(
            f"http://127.0.0.1:{PORT}/disparity", data=body,
            headers={"Content-Type": "application/json"})
        t = time.time()
        with urllib.request.urlopen(req, timeout=600) as r:
            rep = json.loads(r.read())
        return time.time() - t, rep.get("batched_n", 1)

    # (0) unmeasured warm burst: exercise the batch+stack executables
    # once so per-process compiles don't land in the measured windows
    warm_threads = [threading.Thread(target=post) for _ in range(8)]
    for t in warm_threads:
        t.start()
    for t in warm_threads:
        t.join()
    print("warm burst done", flush=True)

    # (1) sequential baseline
    post()   # absorb any first-request residue
    lat = []
    t0 = time.time()
    for _ in range(10):
        dt, _ = post()
        lat.append(dt)
    seq_wall = time.time() - t0
    lat.sort()
    print(f"sequential: 10 reqs in {seq_wall:.2f}s = "
          f"{10/seq_wall:.2f} req/s; latency min {lat[0]*1e3:.0f} "
          f"median {lat[5]*1e3:.0f} p90 {lat[9]*1e3:.0f} ms", flush=True)

    # (2) concurrent load: 8 threads x 4 requests
    N_CLIENTS, N_REQ = 8, 4
    lats, batched = [], []
    lock = threading.Lock()

    def client():
        for _ in range(N_REQ):
            dt, bn = post()
            with lock:
                lats.append(dt)
                batched.append(bn)

    t0 = time.time()
    threads = [threading.Thread(target=client) for _ in range(N_CLIENTS)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.time() - t0
    total = N_CLIENTS * N_REQ
    lats.sort()
    dist = dict(collections.Counter(batched))
    print(f"concurrent ({N_CLIENTS} clients x {N_REQ}): {total} reqs in "
          f"{wall:.2f}s = {total/wall:.2f} req/s "
          f"(sequential was {10/seq_wall:.2f}); latency median "
          f"{lats[total//2]*1e3:.0f} p90 {lats[int(total*0.9)]*1e3:.0f} ms; "
          f"batched_n dist {dist}", flush=True)
    with open("/tmp/r5_serve_load.json", "w") as f:
        json.dump({"seq_rps": 10 / seq_wall, "conc_rps": total / wall,
                   "batched_dist": {str(k): v for k, v in dist.items()},
                   "conc_median_ms": lats[total // 2] * 1e3}, f, indent=1)
    print("DONE r5_serve_load", flush=True)
finally:
    os.killpg(os.getpgid(srv.pid), signal.SIGTERM)
