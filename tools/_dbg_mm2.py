import os
os.environ["JAX_PLATFORMS"]="cpu"
import numpy as np, jax, jax.numpy as jnp
from sahara_tpu.engine.workq import _compact_matmul, _positions

tri=jnp.triu(jnp.ones((512,512),jnp.float32))
CAP=512; E=4; N=CAP*E
mm=jax.jit(lambda f,p: _compact_matmul(f,p,CAP,tri))
def sc(f,p):
    pos,tot=_positions(f,tri)
    dest=jnp.where(f,pos,CAP)
    return jnp.zeros(CAP,jnp.int32).at[dest].set(p,mode="drop"), tot
scj=jax.jit(sc)
rng=np.random.default_rng(0)
bad=0
for trial in range(300):
    mode=trial%5
    fl=np.zeros(N,bool)
    if mode==0: fl=rng.random(N)<rng.random()*0.5
    elif mode==1:
        # random runs
        i=0
        while i<N:
            ln=int(rng.integers(1,50)); v=bool(rng.integers(0,2)); fl[i:i+ln]=v; i+=ln
    elif mode==2:
        cols=rng.integers(0,2,size=E).astype(bool)
        fl=np.repeat(cols, CAP) & (rng.random(N)<0.8)
    elif mode==3:
        fl[rng.integers(0,N,size=rng.integers(0,6))]=True
    else:
        fl=rng.random(N)<0.02
    pay=((rng.integers(0,CAP,size=N)<<4)|rng.integers(0,E,size=N)).astype(np.int32)
    a,ta=mm(jnp.asarray(fl),jnp.asarray(pay))
    b,tb=scj(jnp.asarray(fl),jnp.asarray(pay))
    t=min(int(ta),CAP)
    if int(ta)!=int(tb) or not (np.asarray(a[:t])==np.asarray(b[:t])).all():
        bad+=1
        d=np.nonzero(np.asarray(a[:t])!=np.asarray(b[:t]))[0]
        print("MISMATCH trial",trial,"mode",mode,"tot",int(ta),int(tb),"first bad idx",d[:5])
        if bad>3: break
print("done, bad:",bad)
