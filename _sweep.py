import time, numpy as np, jax
jax.config.update('jax_compilation_cache_dir', '/tmp/jax_comp_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
from csa_tpu.dp import pallas_nw
rng = np.random.default_rng(0)
for B, L in ((8, 131072), (8, 262144)):
    a = rng.integers(0,4,size=(B,L)); b = rng.integers(0,4,size=(B,L))
    try:
        t0=time.perf_counter()
        s = pallas_nw.pairwise_nw_scores(a,b)
        c=time.perf_counter()-t0
        ok = (s[:1] == pallas_nw.nw_scores_host(a[:1],b[:1])).all()
    except Exception as e:
        print(f'B={B} L={L}: FAIL {str(e)[:70]}', flush=True); continue
    ts=[]
    for _ in range(2):
        t0=time.perf_counter(); pallas_nw.pairwise_nw_scores(a,b); ts.append(time.perf_counter()-t0)
    dt=min(ts)
    print(f'B={B} L={L}: {B*L*L/dt/1e9:.2f} Gcell/s ({dt*1e3:.1f} ms) exact={ok} compile={c:.0f}s', flush=True)
