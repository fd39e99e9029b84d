"""Micro-benchmark the device programs in isolation on the real chip.

Times (after one warmup compile) per call, with block_until_ready:
  - inter _hier_me alone (jitted standalone)
  - inter _impl (the full P program)
  - intra tree program (dispatch+fetch)
Reports one JSON line per probe to stdout.

Usage: python tools/prof_device.py -w 1920 -ht 1088 [-cu 32] [-sao]
       [-deblock] [-n 5] [-probe me,impl,intra,fetch]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, n):
    fn()  # warmup/compile
    t0 = time.time()
    for _ in range(n):
        fn()
    return (time.time() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-w", type=int, default=1920)
    ap.add_argument("-ht", type=int, default=1088)
    ap.add_argument("-cu", type=int, default=32)
    ap.add_argument("-n", type=int, default=5)
    ap.add_argument("-sao", action="store_true")
    ap.add_argument("-no-deblock", action="store_true")
    ap.add_argument("-intra-in-p", action="store_true")
    ap.add_argument("-perf", type=int, default=0,
                    help="performance_mode 0/1/2")
    ap.add_argument("-probe", default="me,impl,fetch")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from homerhevc_tpu.config import EncoderConfig
    from homerhevc_tpu.engine.inter_encoder import TpuInterEncoder
    from homerhevc_tpu.hevc.headers import ParamSets

    w, h = args.w, args.ht
    cfg = EncoderConfig(width=w, height=h, qp=32, gop_size=1,
                        cu_size=args.cu, sao=args.sao,
                        deblocking=not args.no_deblock, sign_hiding=True,
                        intra_in_p=args.intra_in_p,
                        performance_mode=args.perf)
    ps = ParamSets.from_config(cfg)
    rng = np.random.default_rng(0)
    sy = rng.integers(0, 256, (h, w), np.uint8)
    su = rng.integers(0, 256, (h // 2, w // 2), np.uint8)
    sv = rng.integers(0, 256, (h // 2, w // 2), np.uint8)
    ry = rng.integers(0, 256, (h, w), np.uint8)
    ru = rng.integers(0, 256, (h // 2, w // 2), np.uint8)
    rv = rng.integers(0, 256, (h // 2, w // 2), np.uint8)

    enc = TpuInterEncoder(ps, cfg, search=16)
    probes = set(args.probe.split(","))

    dev = jax.devices()[0]
    syd = jax.device_put(sy, dev)
    sud = jax.device_put(su, dev)
    svd = jax.device_put(sv, dev)
    ryd = jax.device_put(ry, dev)
    rud = jax.device_put(ru, dev)
    rvd = jax.device_put(rv, dev)

    if "me" in probes:
        lam16 = jnp.int32(100)

        @jax.jit
        def me_only(sy_, ry_):
            out = enc._hier_me(sy_.astype(jnp.int32),
                               ry_.astype(jnp.int32), lam16)
            return [o for o in out if o is not None]

        def run_me():
            r = me_only(syd, ryd)
            np.asarray(r[0])   # real device round trip (axon's
            # block_until_ready does not reliably block)
        t = timeit(run_me, args.n)
        print(json.dumps({"probe": "hier_me", "ms": round(t * 1000, 1)}))

    if "impl" in probes:
        def run_impl():
            out = enc._jit(syd, sud, svd, ryd, rud, rvd,
                           jnp.float32(8.0), jnp.int32(32), qp_map=None)
            np.asarray(out[6])   # meta fetch = completion barrier
        t = timeit(run_impl, args.n)
        print(json.dumps({"probe": "impl_p", "ms": round(t * 1000, 1)}))

    if "fetch" in probes:
        def run_full():
            out = enc.dispatch((syd, sud, svd), (ryd, rud, rvd), 1000.0,
                               qp=32)
            enc.fetch(out)
        t = timeit(run_full, args.n)
        print(json.dumps({"probe": "dispatch_fetch",
                          "ms": round(t * 1000, 1)}))

    if "decide" in probes or "intra" in probes:
        from homerhevc_tpu.engine.intra_tree_encoder import \
            TpuIntraTreeEncoder
        import dataclasses
        cfg_i = dataclasses.replace(cfg, intra_rdo=True)
        ienc = TpuIntraTreeEncoder(ps, cfg_i)

    if "decide" in probes:
        def run_decide():
            r = ienc._decide_jit(syd, sud, svd, jnp.int32(32))
            np.asarray(r[0])   # force a real device round trip (axon's
            # block_until_ready does not reliably block)
        t = timeit(run_decide, args.n)
        print(json.dumps({"probe": "intra_decide", "ms": round(t * 1000, 1)}))

    if "intra" in probes:
        def run_intra():
            ienc.encode_frame(sy, su, sv, 32)
        t = timeit(run_intra, args.n)
        print(json.dumps({"probe": "intra_tree", "ms": round(t * 1000, 1)}))


if __name__ == "__main__":
    main()
