// Decode a .dbde file with the reference streaming file walker
// (dbde_start_file_walk / dbde_walk_a_file / dbde_end_file_walk,
// /root/reference/dbde_util.cpp:362-426) and dump raw u8 pixels.
//
// Usage: walkdump in.dbde out.raw   — prints "frames=N" on success.
// Built at -O0 by tests/test_reference_interop.py (the reference miscompiles
// at -O2/-O3 under modern gcc; see that file's module docstring).
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>

#include "dbde_util.h"

int main(int argc, char **argv) {
    if (argc != 3) {
        fprintf(stderr, "usage: walkdump in.dbde out.raw\n");
        return 2;
    }
    video_header vh;
    dbde_file_walker w = dbde_start_file_walk(argv[1], 4, &vh);
    if (!w.fptr) {
        printf("OPEN FAIL\n");
        return 1;
    }
    fprintf(stderr, "H=%llu W=%llu hz=%f\n", (unsigned long long)vh.height,
            (unsigned long long)vh.width, vh.frame_hz);
    uint8_t *img = (uint8_t *)malloc(vh.height * vh.width);
    frame_header fh;
    FILE *out = fopen(argv[2], "wb");
    int n = 0;
    while (dbde_walk_a_file(&w, &fh, img)) {
        fprintf(stderr, "frame idx=%llu ns=%llu\n", (unsigned long long)fh.index,
                (unsigned long long)fh.elapsed_ns);
        fwrite(img, 1, vh.height * vh.width, out);
        n++;
    }
    fclose(out);
    dbde_end_file_walk(&w);
    free(img);
    printf("frames=%d\n", n);
    return 0;
}
