"""One-off: branch-count histogram over the bench workload (first chunk)."""
import numpy as np, os, time
import bench
from sahara_tpu.alphabet import D_DNA5
from sahara_tpu.engine.device import DeviceIndex
from sahara_tpu.engine.tape import compile_tape
from sahara_tpu.engine.workq import run_workq_search
from sahara_tpu.index.fmindex import load_index
from sahara_tpu.schemes import GENERATORS, expand

ref, queries = bench.load_workload()
queries = [s for q in queries[:4096] for s in (q, D_DNA5.reverse_complement_rank(q).astype(np.uint8))]
idx_path = os.path.expanduser("~/.cache/sahara_tpu/bench_index40.idx")
if not os.path.exists(idx_path):
    from sahara_tpu.index.build import build_bifmindex
    from sahara_tpu.index.fmindex import save_index
    host = build_bifmindex([ref], 6, "d_dna5", rate=16)
    save_index(idx_path, host)
else:
    host = load_index(idx_path)
dev = DeviceIndex.from_host(host)
tape = compile_tape(expand(GENERATORS["optimum"].generator(0, 2, 0, 0), 100))
qarr = np.stack(queries).astype(np.int32)
h = run_workq_search(dev, qarr, tape, edit=True, dedup=True)
print("hits", h.n_hits)

prof = h.live_profile
seed = prof[0]
hist = prof[1:].reshape(-1, 6)
print(f"seed={seed}")
tot_total = hist[:,0].sum(); tot_alive = hist[:,1].sum()
tot_c1 = hist[:,2].sum(); tot_c2 = hist[:,3].sum(); tot_over = hist[:,4].sum(); tot_sat = hist[:,5].sum()
print(f"sum(next_live)={tot_total} sum(alive_parents)={tot_alive} c1={tot_c1} c2={tot_c2} over2={tot_over} saturated={tot_sat} satfrac={tot_sat/max(tot_alive,1):.3f}")
print(f"frac parents with >2 cands' extra candidates vs total: {tot_over/max(tot_total,1):.3f}")
for i in range(0, len(hist), 6):
    t, a, c1, c2, o, s = hist[i]
    print(f"step {i:3d}: next={t:6d} alive={a:6d} c1={c1:6d} c2={c2:6d} over2={o:6d} sat={s:6d}")
