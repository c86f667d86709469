// Encode raw u8 frames to a .dbde file with the reference encoder
// (dbde_pack_video_header + dbde_pack_frame, /root/reference/dbde_util.cpp).
//
// Usage: encdump W H N in.raw out.dbde   — frame index i gets index=i*7 and
// the video header gets frame_hz=750.5 (arbitrary values the reader must
// surface exactly).  Built at -O0 by tests/test_reference_interop.py.
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>

#include "dbde_util.h"

int main(int argc, char **argv) {
    if (argc != 6) {
        fprintf(stderr, "usage: encdump W H N in.raw out.dbde\n");
        return 2;
    }
    int W = atoi(argv[1]), H = atoi(argv[2]), N = atoi(argv[3]);
    FILE *in = fopen(argv[4], "rb"), *out = fopen(argv[5], "wb");
    if (!in || !out) {
        fprintf(stderr, "open fail\n");
        return 1;
    }
    video_header vh = {3, (uint64_t)H, (uint64_t)W, 750.5};
    uint8_t hdr[64];
    size_t n = dbde_pack_video_header(vh, hdr);
    fwrite(hdr, 1, n, out);
    uint8_t *img = (uint8_t *)malloc((size_t)W * H);
    uint8_t *pk = (uint8_t *)malloc((size_t)W * H * 10 + 4096);
    for (int i = 0; i < N; i++) {
        if (fread(img, 1, (size_t)W * H, in) != (size_t)(W * H)) break;
        size_t m = dbde_pack_frame(i * 7, img, W, H, pk);
        fwrite(pk, 1, m, out);
    }
    free(img);
    free(pk);
    fclose(in);
    fclose(out);
    printf("ok\n");
    return 0;
}
