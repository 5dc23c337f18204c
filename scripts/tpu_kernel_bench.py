import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import time, numpy as np, jax
import jax.numpy as jnp
from visual_rag_tpu.index import CollectionSchema, IndexBuilder
from visual_rag_tpu.ops.kernels import pooled_maxsim_scores, rerank_candidates
from visual_rag_tpu.retrieval.scoring import score_padded_tokens, rerank_ragged
print('backend', jax.default_backend())
rng = np.random.default_rng(0)
D, DIM = 2000, 128
b = IndexBuilder(CollectionSchema.standard(storage_dtype='bfloat16'))
for i in range(D):
    n = int(rng.integers(100, 833))
    b.add(f'd{i}', {
        'initial': rng.standard_normal((n,DIM)).astype(np.float32),
        'mean_pooling': rng.standard_normal((13,DIM)).astype(np.float32),
        'experimental_pooling': rng.standard_normal((13,DIM)).astype(np.float32),
        'global_pooling': rng.standard_normal(DIM).astype(np.float32)})
idx = b.seal()
mp = idx.store('mean_pooling'); init = idx.store('initial')
B, NQ = 16, 24
queries = rng.standard_normal((B,NQ,DIM)).astype(np.float32)
queries /= np.linalg.norm(queries,axis=-1,keepdims=True)
qmask = np.ones((B,NQ),bool)
qj, qmj = jnp.asarray(queries), jnp.asarray(qmask)

t0=time.time()
s = pooled_maxsim_scores(jnp.transpose(mp.values,(1,0,2)), jnp.asarray(mp.mask).T, qj, qmj, block_d=128)
s.block_until_ready(); print('prefetch compile+run %.1fs' % (time.time()-t0))
t0=time.time()
for _ in range(20):
    s = pooled_maxsim_scores(jnp.transpose(mp.values,(1,0,2)), jnp.asarray(mp.mask).T, qj, qmj, block_d=128)
s.block_until_ready(); dt=(time.time()-t0)/20
print('prefetch warm %.2fms/batch -> %.3fms/query' % (dt*1000, dt/B*1000))
ref = np.asarray(score_padded_tokens(mp.values, mp.mask, jnp.asarray(queries[0]), compute_dtype='bfloat16'))
print('prefetch max diff vs xla:', np.abs(np.asarray(s)[0]-ref).max())

K = 64
cands = np.stack([rng.choice(D, K, replace=False) for _ in range(B)]).astype(np.int32)
cj = jnp.asarray(cands)
t0=time.time()
r = rerank_candidates(init.flat, init.offsets, init.lengths, qj, qmj, cj, init.max_len, group=8)
r.block_until_ready(); print('rerank compile+run %.1fs' % (time.time()-t0))
t0=time.time()
for _ in range(20):
    r = rerank_candidates(init.flat, init.offsets, init.lengths, qj, qmj, cj, init.max_len, group=8)
r.block_until_ready(); dt=(time.time()-t0)/20
print('rerank warm %.2fms/batch -> %.3fms/query' % (dt*1000, dt/B*1000))
ref_r = np.asarray(rerank_ragged(init.flat, init.offsets, init.lengths, jnp.asarray(queries[0]), cj[0], init.max_len, compute_dtype='bfloat16'))
d = np.abs(np.asarray(r)[0]-ref_r)
print('rerank max absdiff vs xla:', d.max())
# XLA rerank timing for comparison (per query loop)
t0=time.time()
for bq in range(B):
    rr = rerank_ragged(init.flat, init.offsets, init.lengths, jnp.asarray(queries[bq]), cj[bq], init.max_len, compute_dtype='bfloat16')
rr.block_until_ready(); print('xla rerank loop warm %.2fms/batch' % ((time.time()-t0)*1000))
