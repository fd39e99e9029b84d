"""RD measurement harness: encode a raw YUV420 clip with a given config,
report fps / kbps / PSNR(Y,U,V) as one JSON line, and optionally dump the
stream. Companion to bench.py for the BASELINE.md comparison tables.

Usage:
  python tools/measure_rd.py -i /tmp/clips/synthetic_720p.yuv -w 1280 \
      -ht 720 -n 50 -qp 32 -gop 1 -cu 32 [-backend golden] [-sao] [-aq S]
      [-gpb] [-nref N] [-o out.265]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def psnr(a, b):
    d = a.astype(np.float64) - b.astype(np.float64)
    mse = (d * d).mean()
    return 99.0 if mse == 0 else 10 * np.log10(255.0 * 255.0 / mse)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-i", required=True)
    ap.add_argument("-w", type=int, default=1280)
    ap.add_argument("-ht", type=int, default=720)
    ap.add_argument("-n", type=int, default=50)
    ap.add_argument("-qp", type=int, default=32)
    ap.add_argument("-gop", type=int, default=1)
    ap.add_argument("-cu", type=int, default=32)
    ap.add_argument("-fps", type=float, default=25.0)
    ap.add_argument("-backend", default="auto")
    ap.add_argument("-sao", action="store_true")
    ap.add_argument("-no-deblock", action="store_true")
    ap.add_argument("-aq", type=float, default=0.0)
    ap.add_argument("-gpb", action="store_true")
    ap.add_argument("-cqo", type=int, default=2,
                    help="chroma QP offset (pps cb/cr_qp_offset)")
    ap.add_argument("-nref", type=int, default=1)
    ap.add_argument("-intra-in-p", action="store_true")
    ap.add_argument("-intra-rdo", action="store_true")
    ap.add_argument("-scaling-lists", action="store_true")
    ap.add_argument("-num-b", type=int, default=0)
    ap.add_argument("-me_range", type=int, default=32)
    ap.add_argument("-bitrate", type=int, default=0,
                    help="kbps; >0 selects VBR (bitrate_mode=2) and also "
                         "enables reinit_gop_on_scene_change (the "
                         "reference's VBR default); pass -no-scene-reinit "
                         "to opt out")
    ap.add_argument("-no-scene-reinit", action="store_true",
                    help="disable scene-change GOP reinit under -bitrate")
    ap.add_argument("-cbr", action="store_true",
                    help="with -bitrate: CBR (bitrate_mode=1) instead of VBR")
    ap.add_argument("-rc-ctu", action="store_true",
                    help="row-granular rate control (cfg.rc_ctu)")
    ap.add_argument("-warmup", type=int, default=0,
                    help="encode the first N frames through a throwaway "
                         "pipeline first (same compiled device programs), "
                         "so the timed run excludes jit compile time")
    ap.add_argument("-o", default=None)
    ap.add_argument("-no-metrics", action="store_true",
                    help="skip recon download + PSNR (pure encode "
                         "throughput; the recon transfer costs ~0.3 "
                         "s/frame at 1080p over the tunnel)")
    ap.add_argument("-profile", action="store_true",
                    help="print the stage profiler report to stderr")
    ap.add_argument("-label", default="rd")
    ap.add_argument("-qps", default=None,
                    help="comma list; run each QP reusing the compiled "
                         "device programs (QP is a traced input)")
    args = ap.parse_args()
    if args.qps:
        if args.bitrate:
            ap.error("-qps (fixed-QP sweep) and -bitrate (rate control) "
                     "are mutually exclusive")
        run_multi(args)
        return

    from homerhevc_tpu.config import BitrateMode, EncoderConfig
    from homerhevc_tpu.engine.pipeline import EncoderPipeline
    w, h = args.w, args.ht
    cfg = EncoderConfig(width=w, height=h, qp=args.qp, gop_size=args.gop,
                        cu_size=args.cu, sao=args.sao,
                        deblocking=not args.no_deblock, sign_hiding=True,
                        intra_period=0 if args.gop else 100,
                        aq_strength=args.aq, gpb=args.gpb,
                        chroma_qp_offset=args.cqo,
                        num_ref_frames=args.nref,
                        intra_in_p=args.intra_in_p,
                        intra_rdo=args.intra_rdo,
                        scaling_lists=args.scaling_lists,
                        num_b=args.num_b,
                        me_range=args.me_range,
                        rc_ctu=args.rc_ctu,
                        bitrate_mode=((BitrateMode.CBR if args.cbr
                                       else BitrateMode.VBR) if args.bitrate
                                      else BitrateMode.FIXED_QP),
                        bitrate_kbps=args.bitrate or 1250,
                        frame_rate=args.fps,
                        reinit_gop_on_scene_change=bool(args.bitrate)
                        and not args.no_scene_reinit)
    pipe = EncoderPipeline(cfg, backend=args.backend)
    fsz = w * h * 3 // 2
    if args.warmup > 0:
        # compile pass: run N frames through a twin pipeline, then hand its
        # compiled device encoder objects to the timed pipeline (QP and the
        # per-frame planes are traced inputs; one compile per geometry)
        wp = pipe
        pipe = EncoderPipeline(cfg, backend=args.backend)
        with open(args.i, "rb") as wraw:
            for _ in range(args.warmup):
                buf = wraw.read(fsz)
                if len(buf) < fsz:
                    break
                a = np.frombuffer(buf, np.uint8)
                for _ in wp.push(a[:w * h].reshape(h, w),
                                 a[w * h:w * h + w * h // 4]
                                 .reshape(h // 2, w // 2),
                                 a[w * h + w * h // 4:]
                                 .reshape(h // 2, w // 2)):
                    pass
            for _ in wp.flush():
                pass
        for k in ("_tpu_intra", "_tpu_inter"):
            if getattr(wp, k) is not None:
                setattr(pipe, k, getattr(wp, k))
    raw = open(args.i, "rb")
    out = open(args.o, "wb") if args.o else None
    t0 = time.time()
    total_bits = 0
    ps_y = ps_u = ps_v = 0.0
    nf = 0
    srcs = []

    def feed():
        for _ in range(args.n):
            buf = raw.read(fsz)
            if len(buf) < fsz:
                return
            a = np.frombuffer(buf, np.uint8)
            y = a[:w * h].reshape(h, w)
            u = a[w * h:w * h + w * h // 4].reshape(h // 2, w // 2)
            v = a[w * h + w * h // 4:].reshape(h // 2, w // 2)
            yield y, u, v

    def consume(ef):
        nonlocal total_bits, ps_y, ps_u, ps_v, nf
        from homerhevc_tpu.utils.profiler import PROFILER
        total_bits += ef.bits
        if out is not None:
            out.write(ef.annex_b())
        if not args.no_metrics:
            with PROFILER.scope("consume_recon"):
                r = ef.recon
            sy, su, sv = srcs[ef.poc]
            with PROFILER.scope("consume_psnr"):
                ps_y += psnr(r["y"], sy)
                ps_u += psnr(r["u"], su)
                ps_v += psnr(r["v"], sv)
        nf += 1

    for y, u, v in feed():
        srcs.append((y, u, v))
        for ef in pipe.push(y, u, v):
            consume(ef)
    for ef in pipe.flush():
        consume(ef)
    dt = time.time() - t0
    kbps = total_bits * args.fps / max(nf, 1) / 1000.0
    print(json.dumps({
        "label": args.label, "frames": nf, "fps": round(nf / dt, 2),
        "kbps": round(kbps, 1), "psnr_y": round(ps_y / max(nf, 1), 2),
        "psnr_u": round(ps_u / max(nf, 1), 2),
        "psnr_v": round(ps_v / max(nf, 1), 2),
    }))
    if args.profile:
        from homerhevc_tpu.utils.profiler import PROFILER
        print(PROFILER.report(), file=sys.stderr)


def run_multi(args):
    """Encode the clip once per QP in ONE process, reusing the compiled
    device encoder objects across pipelines (QP is a traced device input,
    so one compile per geometry serves every QP; a fresh process would pay
    the ~minutes tunnel compile per run)."""
    from homerhevc_tpu.config import EncoderConfig
    from homerhevc_tpu.engine.pipeline import EncoderPipeline
    w, h = args.w, args.ht
    fsz = w * h * 3 // 2
    raw = np.fromfile(args.i, np.uint8)
    frames = []
    for i in range(args.n):
        a = raw[i * fsz:(i + 1) * fsz]
        if len(a) < fsz:
            break
        frames.append((a[:w * h].reshape(h, w),
                       a[w * h:w * h + w * h // 4].reshape(h // 2, w // 2),
                       a[w * h + w * h // 4:fsz].reshape(h // 2, w // 2)))
    shared = {}
    for qi, qp in enumerate(int(q) for q in args.qps.split(",")):
        cfg = EncoderConfig(width=w, height=h, qp=qp, gop_size=args.gop,
                            cu_size=args.cu, sao=args.sao,
                            deblocking=not args.no_deblock,
                            sign_hiding=True,
                            intra_period=0 if args.gop else 100,
                            aq_strength=args.aq, gpb=args.gpb,
                            chroma_qp_offset=args.cqo,
                            num_ref_frames=args.nref,
                            intra_in_p=args.intra_in_p,
                            intra_rdo=args.intra_rdo,
                            scaling_lists=args.scaling_lists,
                            num_b=args.num_b,
                            me_range=args.me_range,
                            reinit_gop_on_scene_change=False)
        pipe = EncoderPipeline(cfg, backend=args.backend)
        for k, v in shared.items():
            setattr(pipe, k, v)
        t0 = time.time()
        total_bits = 0
        ps = np.zeros(3)
        nf = 0
        for i, (y, u, v) in enumerate(frames):
            for ef in pipe.push(y, u, v):
                total_bits += ef.bits
                r = ef.recon
                s = frames[ef.poc]
                ps += [psnr(r["y"], s[0]), psnr(r["u"], s[1]),
                       psnr(r["v"], s[2])]
                nf += 1
        for ef in pipe.flush():
            total_bits += ef.bits
            r = ef.recon
            s = frames[ef.poc]
            ps += [psnr(r["y"], s[0]), psnr(r["u"], s[1]),
                   psnr(r["v"], s[2])]
            nf += 1
        dt = time.time() - t0
        shared = {k: getattr(pipe, k)
                  for k in ("_tpu_intra", "_tpu_inter") if getattr(pipe, k)}
        print(json.dumps({
            "label": f"{args.label}_qp{qp}", "frames": nf,
            "fps": round(nf / dt, 2),
            "kbps": round(total_bits * args.fps / max(nf, 1) / 1000.0, 1),
            "psnr_y": round(ps[0] / max(nf, 1), 2),
            "psnr_u": round(ps[1] / max(nf, 1), 2),
            "psnr_v": round(ps[2] / max(nf, 1), 2),
        }), flush=True)


if __name__ == "__main__":
    main()
