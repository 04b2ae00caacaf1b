"""Per-level scan microbench: time lax.scan over N iters of each stage/attn
kernel at CFG batch 128, bf16 — pinpoints where the 8.9ms step goes."""
import time, sys, functools
t0 = time.time()
def log(*a): print(f"[{time.time()-t0:6.1f}s]", *a, flush=True)
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from diffusion_model_tpu.ops.stage import fused_stage_pallas
from diffusion_model_tpu.ops.attention import attention_block_pallas
log("devices:", jax.devices())
key = jax.random.PRNGKey(0)
B, N = 128, 300

def mk_block(key, cin, mid, cout):
    k1, k2 = jax.random.split(key)
    return {"w1": jax.random.normal(k1,(3,3,cin,mid))*0.05,
            "w2": jax.random.normal(k2,(3,3,mid,cout))*0.05,
            "s1": jnp.ones((mid,)), "b1": jnp.zeros((mid,)),
            "s2": jnp.ones((cout,)), "b2": jnp.zeros((cout,))}

def timeit(name, fn, x, gflop):
    f = jax.jit(lambda x0: jax.lax.scan(lambda c, _: (fn(c), None), x0,
                                        None, length=N)[0])
    r = f(x); r.block_until_ready()
    t = time.time(); r = f(x); r.block_until_ready(); dt = time.time() - t
    ms = dt / N * 1e3
    log(f"{name:22s} {ms:7.3f} ms/iter   {gflop/ms:6.1f} TFLOP/s" if gflop else f"{name:22s} {ms:7.3f} ms/iter")

# stage: (name, H, W, chans, residuals, emb)
stages = [
    ("inc",   28, [(4,64,64)],              (False,), False),
    ("down1", 14, [(64,64,64),(64,64,128)], (True,False), True),
    ("down2",  7, [(128,128,128),(128,128,256)],(True,False), True),
    ("down3",  3, [(256,256,256),(256,256,256)],(True,False), True),
    ("bot",    3, [(256,512,512),(512,512,512),(512,512,256)],(False,)*3, False),
    ("up1",    7, [(512,512,512),(512,256,128)],(True,False), True),
    ("up2",   14, [(256,256,256),(256,128,64)],(True,False), True),
    ("up3",   28, [(128,128,128),(128,64,64)],(True,False), True),
]
def conv_gf(hw,ci,co): return 2*B*hw*9*ci*co/1e9
for name, H, chans, residuals, has_emb in stages:
    hw = H*H
    blocks = tuple(mk_block(jax.random.fold_in(key, i+hash(name)%97), ci, cm, co)
                   for i,(ci,cm,co) in enumerate(chans))
    emb = jnp.zeros((B, chans[-1][2]), jnp.bfloat16) if has_emb else None
    gf = sum(conv_gf(hw,ci,cm)+conv_gf(hw,cm,co) for ci,cm,co in chans)
    cin = chans[0][0]
    x0 = jax.random.normal(key, (B,H,H,cin)).astype(jnp.bfloat16)
    # scan needs fn: x -> same shape; wrap with a projection back to cin via slice/pad
    cout = chans[-1][2]
    def fn(x, blocks=blocks, residuals=residuals, emb=emb, cin=cin, cout=cout):
        y = fused_stage_pallas(x, blocks, residuals, emb)
        # map (B,H,W,cout) back to (B,H,W,cin) cheaply to keep scan shape
        if cout >= cin: return y[..., :cin] + 0
        reps = -(-cin // cout)
        return jnp.concatenate([y]*reps, axis=-1)[..., :cin]
    try:
        timeit(name, fn, x0, gf)
    except Exception as e:
        log(name, "FAIL", str(e)[:120])

def attn_gf(T,C):
    proj=2*B*T*C*3*C+2*B*T*C*C; sc=2*B*T*T*C*2; ff=4*B*T*C*C
    return (proj+sc+ff)/1e9
for name, T, C in [("sa1",196,128),("sa2",49,256),("sa3",9,256),("sa4",49,128),("sa5",196,64),("sa6",784,64)]:
    x = jax.random.normal(key,(B,T,C)).astype(jnp.bfloat16)
    p = {"ln_scale": jnp.ones((C,)), "ln_bias": jnp.zeros((C,)),
         "qkv_w": jax.random.normal(key,(C,3*C))*0.05, "qkv_b": jnp.zeros((3*C,)),
         "out_w": jax.random.normal(key,(C,C))*0.05, "out_b": jnp.zeros((C,)),
         "ff_ln_scale": jnp.ones((C,)), "ff_ln_bias": jnp.zeros((C,)),
         "ff1_w": jax.random.normal(key,(C,C))*0.05, "ff1_b": jnp.zeros((C,)),
         "ff2_w": jax.random.normal(key,(C,C))*0.05, "ff2_b": jnp.zeros((C,))}
    fn = lambda x, p=p: attention_block_pallas(x, p, 4)
    try:
        timeit(name, fn, x, attn_gf(T,C))
    except Exception as e:
        log(name, "FAIL", str(e)[:120])
log("DONE")
