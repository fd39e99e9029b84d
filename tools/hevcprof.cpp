// Offline profiling harness for the native serializer: replays a slice
// captured with HEVCENC_DUMP=<file> (see hevcenc.cpp) in a tight loop so
// the hot path can be timed / gprof'd outside the Python pipeline.
//
// Build:  g++ -O3 -march=native -funroll-loops -pthread -Ihomerhevc_tpu/native \
//             -o /tmp/hevcprof tools/hevcprof.cpp
// Usage:  /tmp/hevcprof /tmp/hevcdump.bin [iters]

#include "../homerhevc_tpu/native/hevcenc.cpp"

#include <cstdio>
#include <chrono>

static std::vector<uint8_t> rd(FILE* f) {
  long n = 0;
  if (fread(&n, sizeof n, 1, f) != 1) { fprintf(stderr, "short read\n"); exit(1); }
  std::vector<uint8_t> v((size_t)n);
  if (n && fread(v.data(), 1, (size_t)n, f) != (size_t)n) { fprintf(stderr, "short read\n"); exit(1); }
  return v;
}

int main(int argc, char** argv) {
  if (argc < 2) { fprintf(stderr, "usage: %s dump [iters]\n", argv[0]); return 1; }
  int iters = argc > 2 ? atoi(argv[2]) : 50;
  FILE* f = fopen(argv[1], "rb");
  if (!f) { perror("open"); return 1; }
  long s[16];
  if (fread(s, sizeof s, 1, f) != 1) { fprintf(stderr, "bad dump\n"); return 1; }
  auto ctx = rd(f);
  auto cu_depth = rd(f), part_nxn = rd(f), luma_mode = rd(f),
       chroma_mode = rd(f), tr_depth = rd(f), pred_mode = rd(f);
  auto w_bm = rd(f), w_mk = rd(f), w_cd = rd(f), w_ei = rd(f), w_ev = rd(f);
  fclose(f);
  int width = (int)s[0], height = (int)s[1];
  long cap = (long)width * height * 4 + 65536;
  std::vector<uint8_t> out((size_t)cap);
  std::vector<long> row_sizes((size_t)(height >> 4) + 8);
  long n = 0;
  auto t0 = std::chrono::steady_clock::now();
  for (int i = 0; i < iters; i++) {
    n = hevcenc_encode_slice2(
        ctx.data(), width, height, (int)s[2], (int)s[3], (int)s[4], (int)s[5],
        (int)s[6], (int)s[7], (int)s[8], (int)s[9], /*wpp=*/0, 1, 1,
        (int)s[10], (int)s[11],
        cu_depth.data(), part_nxn.data(), luma_mode.data(),
        chroma_mode.data(), tr_depth.data(), pred_mode.data(),
        /*qp_map=*/nullptr, nullptr, nullptr, nullptr,
        /*skip..*/nullptr, nullptr, nullptr, nullptr, nullptr, nullptr,
        nullptr, nullptr, nullptr, nullptr,
        /*sao*/nullptr, nullptr, nullptr, nullptr, nullptr, nullptr,
        nullptr, nullptr,
        out.data(), cap, row_sizes.data(), 1,
        w_bm.data(), (const uint16_t*)w_mk.data(), w_cd.data(),
        (const int32_t*)w_ei.data(), (const int16_t*)w_ev.data(),
        s[12], s[13], s[14]);
  }
  auto dt = std::chrono::duration<double>(
      std::chrono::steady_clock::now() - t0).count();
  printf("payload %ld bytes, %d iters, %.2f ms/slice\n", n, iters,
         1000.0 * dt / iters);
#ifdef HEVCENC_FINEPROF
  const char* nm[6] = {"prologue", "gather", "sig-loop", "g1/sign",
                       "remaining", "coded CGs"};
  uint64_t tot = 0;
  for (int i = 0; i < 5; i++) tot += g_fine[i];
  for (int i = 0; i < 5; i++)
    printf("  %-9s %6.1f Mcyc/slice (%4.1f%%)\n", nm[i],
           g_fine[i] / 1e6 / iters, 100.0 * g_fine[i] / tot);
  printf("  %-9s %6.0f /slice\n", nm[5], (double)g_fine[5] / iters);
#endif
  return 0;
}
