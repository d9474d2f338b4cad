"""Round-4 TPU serving-mode smoke: start `--serve` with warmup, then
measure end-to-end HTTP request latency (base64 PNG pair in, PNG+PFM
out) on real hardware.  The serving story so far was CPU-tested
(tests/test_serve.py) with kernel numbers from bench probes; this
records the actual request-path number: frame compute + device lock +
base64/PNG codec work + HTTP.

Kills the exact child PID on exit (never pkill by pattern).
"""

import base64
import json
import os
import signal
import subprocess
import sys
import time
import urllib.request

PORT = 8099
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
    deadline = t0 + 900
    while time.time() < deadline:
        try:
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{PORT}/healthz", timeout=5) as r:
                h = json.loads(r.read())
                break
        except Exception:
            if srv.poll() is not None:
                print("server died:", srv.stdout.read()[-2000:], flush=True)
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
        t0 = time.time()
        with urllib.request.urlopen(req, timeout=600) as r:
            out = json.loads(r.read())
        dt = time.time() - t0
        return dt, out

    dt, out = post()   # first request may pay residual compile
    print(f"first request: {dt*1e3:.1f} ms "
          f"(keys: {sorted(out)})", flush=True)
    lat = []
    for _ in range(10):
        dt, _ = post()
        lat.append(dt * 1e3)
    lat.sort()
    print(f"warm request latency over 10: min {lat[0]:.1f} ms, "
          f"median {lat[5]:.1f} ms, p90 {lat[8]:.1f} ms", flush=True)
    png = base64.b64decode(out["disparity_png"])
    print(f"disparity PNG bytes: {len(png)} (magic ok: "
          f"{png[:8] == bytes([137, 80, 78, 71, 13, 10, 26, 10])})",
          flush=True)
finally:
    os.killpg(srv.pid, signal.SIGTERM)
    try:
        srv.wait(timeout=30)
    except subprocess.TimeoutExpired:
        os.killpg(srv.pid, signal.SIGKILL)
print("done", flush=True)
