import io, time, numpy as np, jax
jax.config.update('jax_compilation_cache_dir', '/tmp/jax_comp_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
from csa_tpu.io import fasta as fio
from csa_tpu.rotation import pipeline as rot
seqs = fio.load_fasta('/tmp/refbuild/plasmid.fasta', log=io.StringIO())
t0 = time.time()
res = rot.analyze(seqs, log=io.StringIO(), backend='jax')
print('jax backend compile+first:', round(time.time()-t0, 2), 's', flush=True)
for _ in range(2):
    t0 = time.time()
    res = rot.analyze(seqs, log=io.StringIO(), backend='jax')
    print('jax backend hot:', round(time.time()-t0, 2), 's', flush=True)
mine = {n: int(r) for n, r in zip(seqs.names, res.rotations)}
ref = {}
for line in open('/tmp/refbuild/plasmid-Rotated.fasta'):
    if line.startswith('>'):
        name, _, r = line[1:].strip().rpartition(' @ ')
        ref[name] = int(r)
print('parity vs reference:', mine == ref, flush=True)
