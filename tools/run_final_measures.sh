#!/bin/bash
set -u
cd /root/repo
# 1) official full bench (600 s in-bench cooldown; box idle ~25 min already)
python bench.py > .bench_final_r4.out 2> .bench_final_r4.err
# 2) cores-consumed probe: local[1] vs local[4] frontier legs, whole-box
#    /proc/stat accounting (no /usr/bin/time in this container)
python - <<'PYEOF' > .cores_probe.json 2> .cores_probe.err
import json, os, subprocess, sys, time

def busy_jiffies():
    with open("/proc/stat") as f:
        parts = f.readline().split()[1:]
    v = list(map(int, parts))
    idle = v[3] + v[4]  # idle + iowait
    return sum(v) - idle

HZ = os.sysconf("SC_CLK_TCK")
out = {}
for cpus in ("1", "4"):
    time.sleep(300)
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=cpus,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.1",
        SPARK_BENCH_BODY_REPEATS="120",
        SPARK_BENCH_URLS="150000",
        SPARK_BENCH_BUDGET="150000",
    )
    b0, t0 = busy_jiffies(), time.monotonic()
    p = subprocess.run(
        [sys.executable, "bench.py", "--frontier-only"],
        env=env, capture_output=True, text=True, timeout=3600,
    )
    wall = time.monotonic() - t0
    cpu_s = (busy_jiffies() - b0) / HZ
    lines = [ln for ln in p.stdout.splitlines() if ln.startswith("{")]
    leg = json.loads(lines[-1])["frontier"] if lines else {"err": p.returncode}
    out[f"local{cpus}"] = {
        "urls_per_sec": leg.get("urls_per_sec"),
        "wall_s": round(wall, 1),
        "cpu_s": round(cpu_s, 1),
        "avg_cores": round(cpu_s / wall, 2),
    }
print(json.dumps(out))
PYEOF
echo DONE > .final_measures.done
