import os
os.environ["JAX_PLATFORMS"]="cpu"
import numpy as np
import jax.numpy as jnp
from sahara_tpu.engine import workq
from sahara_tpu.engine.workq import _compact_matmul, _positions
import jax
CAP=512
E=4
rng=np.random.default_rng(0)
for density in (0.01, 0.2, 0.9):
    fl=jnp.asarray(rng.random(CAP*E)<density)
    pay=jnp.asarray(((rng.integers(0,CAP,size=CAP*E)<<4)|rng.integers(0,E,size=CAP*E)).astype(np.int32))
    tri=jnp.triu(jnp.ones((512,512),jnp.float32))
    sel,total=jax.jit(lambda f,p: _compact_matmul(f,p,CAP,tri))(fl,pay)
    pos,tot2=jax.jit(lambda f: _positions(f,tri))(fl)
    dest=jnp.where(fl,pos,CAP)
    sel2=jnp.zeros(CAP,jnp.int32).at[dest].set(pay,mode="drop")
    t=int(total); t2=int(tot2)
    n=min(t,CAP)
    ok=(np.asarray(sel[:n])==np.asarray(sel2[:n])).all()
    print(density, "total",t,t2,"match",ok)
    if not ok:
        a=np.asarray(sel); b=np.asarray(sel2)
        bad=np.nonzero(a[:n]!=b[:n])[0]
        print(" first bad", bad[:10], a[bad[:5]], b[bad[:5]])
