/* C ABI conformance client for libSvtAv1EncTpu.so.
 *
 * Compiled against the REFERENCE public headers (EbSvtAv1Enc.h via
 * -I$SVT_AV1_API_DIR) -- the exact surface the ffmpeg/gstreamer
 * plugins use -- and run against the TPU shim: init_handle defaults,
 * set_parameter, init, stream_header (extradata), EbSvtIOFormat input
 * with pixel strides, NULL-picture EOS flush, get_packet with
 * pic_type/pts/EOS flags, release_out_buffer, deinit.
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include "EbSvtAv1.h"
#include "EbSvtAv1Enc.h"

#define W 64
#define H 64
#define STRIDE 80   /* deliberately != W: strides must be honored */

int main(void) {
    EbComponentType *h = NULL;
    EbSvtAv1EncConfiguration cfg;
    memset(&cfg, 0xAA, sizeof(cfg));   /* defaults must overwrite */
    if (svt_av1_enc_init_handle(&h, &cfg) != EB_ErrorNone) return 1;
    if (cfg.enc_mode < 0 || cfg.enc_mode > 13) return 10;
    cfg.source_width = W;
    cfg.source_height = H;
    cfg.qp = 40;
    cfg.enc_mode = 12;
    cfg.intra_period_length = -2;
    cfg.hierarchical_levels = 0;
    cfg.rate_control_mode = 0;
    cfg.encoder_bit_depth = 8;
    if (svt_av1_enc_parse_parameter(&cfg, "preset", "12")
            != EB_ErrorNone) return 11;
    if (svt_av1_enc_set_parameter(h, &cfg) != EB_ErrorNone) return 2;
    if (svt_av1_enc_init(h) != EB_ErrorNone) return 3;

    EbBufferHeaderType *hdr = NULL;
    if (svt_av1_enc_stream_header(h, &hdr) != EB_ErrorNone || !hdr
            || !hdr->p_buffer || hdr->n_filled_len < 4) return 12;
    printf("stream header %u bytes\n", hdr->n_filled_len);
    svt_av1_enc_stream_header_release(hdr);

    /* strided planes */
    uint8_t *y = malloc(STRIDE * H), *u = malloc(STRIDE * H / 2),
            *v = malloc(STRIDE * H / 2);
    for (int i = 0; i < STRIDE * H; i++) y[i] = (i * 7) & 255;
    for (int i = 0; i < STRIDE * H / 2; i++) {
        u[i] = (i * 3) & 255;
        v[i] = (i * 5) & 255;
    }
    EbSvtIOFormat io;
    memset(&io, 0, sizeof(io));
    io.luma = y; io.cb = u; io.cr = v;
    io.y_stride = STRIDE; io.cb_stride = STRIDE / 2;
    io.cr_stride = STRIDE / 2;
    EbBufferHeaderType in;
    memset(&in, 0, sizeof(in));
    in.size = sizeof(in);
    in.p_buffer = (uint8_t *)&io;
    in.pts = 0;
    if (svt_av1_enc_send_picture(h, &in) != EB_ErrorNone) return 4;

    /* standard flush: NULL p_buffer + EOS flag */
    EbBufferHeaderType eos;
    memset(&eos, 0, sizeof(eos));
    eos.size = sizeof(eos);
    eos.flags = EB_BUFFERFLAG_EOS;
    if (svt_av1_enc_send_picture(h, &eos) != EB_ErrorNone) return 5;

    EbBufferHeaderType *out = NULL;
    int got = 0, saw_eos = 0, saw_key = 0;
    for (int it = 0; it < 10; it++) {
        EbErrorType r = svt_av1_enc_get_packet(h, &out, 1);
        if (r == EB_NoErrorEmptyQueue) break;
        if (r != EB_ErrorNone) return 6;
        if (out) {
            got++;
            printf("packet %u bytes pts %lld type %d flags %x\n",
                   out->n_filled_len, (long long)out->pts,
                   (int)out->pic_type, out->flags);
            if (out->pic_type == EB_AV1_KEY_PICTURE) saw_key = 1;
            if (out->flags & EB_BUFFERFLAG_EOS) saw_eos = 1;
            svt_av1_enc_release_out_buffer(&out);
            if (saw_eos) break;
        }
    }
    if (!got || !saw_key || !saw_eos) return 7;
    svt_av1_enc_deinit(h);
    svt_av1_enc_deinit_handle(h);
    printf("version %s\nCAPI OK\n", svt_av1_get_version());
    free(y); free(u); free(v);
    return 0;
}
