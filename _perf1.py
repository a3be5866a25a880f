import numpy as np, time, os
import bench
from sahara_tpu.engine.device import DeviceIndex
from sahara_tpu.engine.tape import compile_tape
from sahara_tpu.engine.workq import run_workq_search, _CAP_MEMORY
from sahara_tpu.index.build import build_bifmindex
from sahara_tpu.index.fmindex import save_index, load_index
from sahara_tpu.schemes import GENERATORS, expand

idx_cache = os.path.expanduser("~/.cache/sahara_tpu/bench_index40.idx")
ref, queries = bench.load_workload()
if os.path.exists(idx_cache):
    t0=time.time(); host = load_index(idx_cache); print("load idx", round(time.time()-t0,1))
else:
    t0=time.time(); host = build_bifmindex([ref], 6, "d_dna5", rate=16); print("build", round(time.time()-t0,1))
    save_index(idx_cache, host)
dev = DeviceIndex.from_host(host)
qarr = np.stack(queries).astype(np.int32)
tape = compile_tape(expand(GENERATORS["optimum"].generator(0, 2, 0, 0), 100))

for i in range(4):
    t0=time.time(); h = run_workq_search(dev, qarr, tape, edit=True, dedup=True); dt=time.time()-t0
    mem = list(_CAP_MEMORY.values())[0]
    plan = mem.get("plan")
    print(f"pass{i} {dt:.2f}s hits={h.n_hits} max_live={h.max_live} plan={plan[0] if plan else None}")
