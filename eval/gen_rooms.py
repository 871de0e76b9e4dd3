"""Synthetic S3DIS-style rooms: floor/ceiling/wall planes + box furniture,
surface-sampled. Seeded; used for the large-scene golden artifact."""
import numpy as np, sys
sys.path.insert(0, '/root/repo')
from pcc_tpu.io import save_point_cloud

def room_cloud(rng, n):
    w, d, h = rng.uniform(4, 10), rng.uniform(4, 10), rng.uniform(2.5, 4)
    quads = []  # (origin, edge1, edge2, weight)
    quads.append((np.zeros(3), np.array([w,0,0]), np.array([0,d,0]), w*d))      # floor
    quads.append((np.array([0,0,h]), np.array([w,0,0]), np.array([0,d,0]), w*d)) # ceiling
    for o, e1 in [((0,0,0),(w,0,0)), ((0,d,0),(w,0,0)), ((0,0,0),(0,d,0)), ((w,0,0),(0,d,0))]:
        quads.append((np.array(o,float), np.array(e1,float), np.array([0,0,h]), np.linalg.norm(e1)*h))
    for _ in range(rng.integers(4, 9)):      # furniture boxes
        bw, bd, bh = rng.uniform(0.4, 2.0, 3)
        bo = np.array([rng.uniform(0, w-bw), rng.uniform(0, d-bd), 0.0])
        for o, e1, e2 in [ (bo+[0,0,bh], [bw,0,0], [0,bd,0]),
                           (bo, [bw,0,0], [0,0,bh]), (bo+[0,bd,0], [bw,0,0], [0,0,bh]),
                           (bo, [0,bd,0], [0,0,bh]), (bo+[bw,0,0], [0,bd,0], [0,0,bh]) ]:
            e1, e2 = np.array(e1,float), np.array(e2,float)
            quads.append((o, e1, e2, np.linalg.norm(e1)*np.linalg.norm(e2)))
    areas = np.array([q[3] for q in quads]); areas /= areas.sum()
    counts = rng.multinomial(n, areas)
    pts = []
    for (o, e1, e2, _), c in zip(quads, counts):
        u, v = rng.random((2, c))
        pts.append(o + u[:,None]*e1 + v[:,None]*e2)
    pc = np.concatenate(pts).astype(np.float32)
    return pc + rng.standard_normal(pc.shape).astype(np.float32) * 0.005

rng = np.random.default_rng(7)
sizes = [65536]*6 + [50000, 100000]   # incl. odd and 100k-point rooms
for i, n in enumerate(sizes):
    save_point_cloud(room_cloud(rng, n), f'room_{i}.ply', path='rooms')
print("rooms done", sizes)
