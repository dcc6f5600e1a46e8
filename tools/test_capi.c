#include <stdio.h>
#include <stdint.h>
#include <stdlib.h>
#include <string.h>
typedef int32_t EbErrorType;
typedef struct { uint32_t w,h,qp; int32_t m,ipl; uint32_t hl,rc,tbr,bd; } Cfg;
typedef struct { uint8_t *p; uint32_t n; uint64_t pts; uint32_t flags; } Buf;
extern EbErrorType svt_av1_enc_init_handle(void**, Cfg*);
extern EbErrorType svt_av1_enc_set_parameter(void*, Cfg*);
extern EbErrorType svt_av1_enc_init(void*);
extern EbErrorType svt_av1_enc_send_picture(void*, Buf*);
extern EbErrorType svt_av1_enc_get_packet(void*, Buf**, uint8_t);
extern EbErrorType svt_av1_enc_release_out_buffer(Buf**);
extern EbErrorType svt_av1_enc_deinit(void*);
extern EbErrorType svt_av1_enc_deinit_handle(void*);
extern const char *svt_av1_get_version(void);
int main(void) {
    void *h; Cfg c;
    if (svt_av1_enc_init_handle(&h, &c)) return 1;
    c.w = 64; c.h = 64; c.qp = 40; c.m = 12; c.ipl = -2; c.hl = 0; c.rc = 0; c.tbr = 0; c.bd = 8;
    if (svt_av1_enc_set_parameter(h, &c)) return 2;
    if (svt_av1_enc_init(h)) return 3;
    int ysz = 64*64, csz = 32*32;
    uint8_t *pic = malloc(ysz + 2*csz);
    for (int i = 0; i < ysz + 2*csz; i++) pic[i] = (i * 7) & 255;
    Buf in = { pic, (uint32_t)(ysz+2*csz), 0, 1 };   /* one frame, EOS */
    if (svt_av1_enc_send_picture(h, &in)) return 4;
    Buf *out = NULL; int got = 0;
    for (int it = 0; it < 10 && !got; it++) {
        if (svt_av1_enc_get_packet(h, &out, 1)) return 5;
        if (out) { got = 1; printf("packet %u bytes pts %llu\n", out->n, (unsigned long long)out->pts); svt_av1_enc_release_out_buffer(&out); }
    }
    if (!got) return 6;
    svt_av1_enc_deinit(h);
    svt_av1_enc_deinit_handle(h);
    printf("version %s\nCAPI OK\n", svt_av1_get_version());
    return 0;
}
