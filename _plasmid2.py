import io, time, numpy as np
from csa_tpu.io import fasta as fio
from csa_tpu.rotation import pipeline as rot
seqs = fio.load_fasta('/tmp/refbuild/plasmid.fasta', log=io.StringIO())
t0 = time.time()
res = rot.analyze(seqs, log=io.StringIO(), backend='numpy')
print('numpy backend wall:', round(time.time()-t0, 2), 's', flush=True)
mine = {n: int(r) for n, r in zip(seqs.names, res.rotations)}
ref = {}
for line in open('/tmp/refbuild/plasmid-Rotated.fasta'):
    if line.startswith('>'):
        name, _, r = line[1:].strip().rpartition(' @ ')
        ref[name] = int(r)
print('parity vs reference:', mine == ref, flush=True)
if mine != ref:
    print('mine:', mine); print('ref :', ref)
