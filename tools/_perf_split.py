import numpy as np, time, os
import bench
from sahara_tpu.alphabet import D_DNA5
from sahara_tpu.engine.device import DeviceIndex
from sahara_tpu.engine.tape import compile_tape
from sahara_tpu.engine.workq import run_workq_search, upload_tape
from sahara_tpu.engine.driver import _locate_flat_hits, search_queries
from sahara_tpu.index.fmindex import load_index
from sahara_tpu.schemes import GENERATORS, expand

idx_cache = os.path.expanduser("~/.cache/sahara_tpu/bench_index40.idx")
ref, queries = bench.load_workload()
queries = [s for q in queries for s in (q, D_DNA5.reverse_complement_rank(q).astype(np.uint8))]
if os.path.exists(idx_cache):
    host = load_index(idx_cache)
else:
    from sahara_tpu.index.build import build_bifmindex
    from sahara_tpu.index.fmindex import save_index
    t0 = time.time(); host = build_bifmindex([ref], 6, "d_dna5", rate=16)
    print("build", round(time.time() - t0, 1)); save_index(idx_cache, host)
dev = DeviceIndex.from_host(host)
tape = compile_tape(expand(GENERATORS["optimum"].generator(0, 2, 0, 0), 100))
dt_tape = upload_tape(tape)
qarr = np.stack(queries).astype(np.int32)
qids = np.arange(len(queries), dtype=np.int64)

# warm both chunks
for start in (0, 8192):
    q = qarr[start:start+8192]
    h = run_workq_search(dev, q, tape, edit=True, dedup=True, device_tape=dt_tape)
    r = _locate_flat_hits(dev, h, tape.num_searches, qids[start:start+8192])

for _ in range(3):
    t0=time.time()
    hs=[]
    for start in (0, 8192):
        hs.append(run_workq_search(dev, qarr[start:start+8192], tape, edit=True, dedup=True, device_tape=dt_tape))
    t1=time.time()
    rs=[_locate_flat_hits(dev, h, tape.num_searches, qids[s:s+8192]) for h,s in zip(hs,(0,8192))]
    t2=time.time()
    print(f"search={t1-t0:.3f}s locate={t2-t1:.3f}s hits={sum(h.n_hits for h in hs)}")

# full driver for comparison
t0=time.time(); r = search_queries(dev, queries, k=2, generator_name="optimum", edit=True, chunk=8192); print(f"driver={time.time()-t0:.3f}s rows={len(r.query_id)}")
