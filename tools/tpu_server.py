"""Persistent TPU experiment server: one axon client init, many jobs.

No tmux in this image, so interactive sessions are driven by a file queue:
drop `NNN.py` files into the job dir and this process execs them (in
submission order) inside the warm perf_r3 namespace, teeing stdout to
`NNN.out` and touching `NNN.done` (or `NNN.fail`) when finished. State
(scene caches, compiled kernels) persists across jobs.

    python tools/tpu_server.py   # run_in_background; jobs via .tpu_jobs/

The queue lives under the repo (mode 0700, ownership-checked), NOT in
world-writable /tmp: anything dropped there is exec'd as this uid.
"""

from __future__ import annotations

import io
import os
import stat
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

JOBS = "/root/repo/.tpu_jobs"
os.makedirs(JOBS, mode=0o700, exist_ok=True)
_st = os.stat(JOBS)
if _st.st_uid != os.getuid() or (_st.st_mode & (stat.S_IWGRP | stat.S_IWOTH)):
    raise SystemExit(f"refusing job dir {JOBS}: not owned by uid "
                     f"{os.getuid()} or group/other-writable")

t0 = time.time()
import tools.perf_r3 as R  # noqa: E402  (pays the axon init)
import jax  # noqa: E402

ns = {k: getattr(R, k) for k in dir(R) if not k.startswith("__")}
ns["R"] = R
print(f"# server ready, devices={jax.devices()} init={time.time()-t0:.0f}s",
      flush=True)

seen = set()
idle_since = time.time()
while True:
    jobs = sorted(
        f for f in os.listdir(JOBS)
        if f.endswith(".py") and f not in seen
        # a fresh server must not replay already-completed jobs
        and not os.path.exists(os.path.join(JOBS, f[:-3] + ".done"))
        and not os.path.exists(os.path.join(JOBS, f[:-3] + ".fail")))
    if not jobs:
        if time.time() - idle_since > 6 * 3600:
            print("# idle 6h, exiting", flush=True)
            break
        time.sleep(0.5)
        continue
    for j in jobs:
        seen.add(j)
        idle_since = time.time()
        path = os.path.join(JOBS, j)
        out_path = path[:-3] + ".out"
        print(f"# job {j}", flush=True)
        buf = io.StringIO()
        real = sys.stdout
        ok = True

        class Tee:
            def write(self, s):
                real.write(s)
                buf.write(s)

            def flush(self):
                real.flush()

        sys.stdout = Tee()
        try:
            with open(path) as fh:
                code = fh.read()
            exec(compile(code, path, "exec"), ns)  # noqa: S102
        except Exception:  # noqa: BLE001
            ok = False
            traceback.print_exc(file=sys.stdout)
        finally:
            sys.stdout = real
        with open(out_path, "w") as fh:
            fh.write(buf.getvalue())
        open(path[:-3] + (".done" if ok else ".fail"), "w").close()
        print(f"# job {j} {'done' if ok else 'FAILED'}", flush=True)
