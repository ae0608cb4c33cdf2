import numpy as np, time, io, sys
rng = np.random.default_rng(42)
n, k = 100_000, 8
base = rng.integers(0, 4, size=n)
ALPH = np.array(list("ACGT"))
rows = []
for i in range(k):
    row = np.roll(base, int(rng.integers(0, n))).copy()
    mut = rng.integers(0, n, size=n // 100)  # 1% point mutations
    row[mut] = rng.integers(0, 4, size=len(mut))
    rows.append(row)
with open('/tmp/refbuild/plasmid.fasta', 'w') as f:
    for i, row in enumerate(rows):
        f.write(f'>plasmid_{i:02d}\n')
        s = ''.join(ALPH[row])
        for j in range(0, n, 70):
            f.write(s[j:j+70] + '\n')
print('wrote /tmp/refbuild/plasmid.fasta')
