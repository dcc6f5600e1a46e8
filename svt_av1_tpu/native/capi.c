/*
 * EbSvtAv1Enc-compatible C ABI over the TPU encoder.
 *
 * Exposes the reference library's public entry points
 * (Source/API/EbSvtAv1Enc.h:951-1061: svt_av1_enc_init_handle,
 * set_parameter, init, send_picture, get_packet, release_out_buffer,
 * deinit, deinit_handle, get_version) so downstream integrations
 * written against the C API (the ffmpeg/gstreamer plugin role,
 * ffmpeg_plugin/ in the reference tree) can link against this library
 * while the encoding itself runs through the embedded Python/JAX
 * pipeline (svt_av1_tpu.api.encoder).
 *
 * Build: tools/build_capi.sh -> libSvtAv1EncTpu.so
 * Independent implementation; EbSvtAv1Enc.h cited for the surface.
 */
#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <stdint.h>
#include <stdlib.h>
#include <string.h>

typedef int32_t EbErrorType;
#define EB_ErrorNone 0
#define EB_ErrorInsufficientResources 0x80001000
#define EB_ErrorBadParameter 0x80001005

typedef struct {
    uint32_t source_width;
    uint32_t source_height;
    uint32_t qp;               /* CRF 0..63 */
    int32_t  enc_mode;         /* preset M0..M13 */
    int32_t  intra_period_length;
    uint32_t hierarchical_levels;
    uint32_t rate_control_mode; /* 0 CRF, 1 VBR, 2 CBR */
    uint32_t target_bit_rate;
    uint32_t encoder_bit_depth;
} EbSvtAv1EncConfigurationTpu;

typedef struct {
    uint8_t *p_buffer;
    uint32_t n_filled_len;
    uint64_t pts;
    uint32_t flags;            /* bit 0: EOS */
} EbBufferHeaderTypeTpu;

typedef struct {
    PyObject *encoder;         /* svt_av1_tpu.api.encoder.Encoder */
    EbSvtAv1EncConfigurationTpu cfg;
    uint64_t pts_in;
} EbComponentTypeTpu;

/* each returned packet owns a reference to its Python bytes object;
 * svt_av1_enc_release_out_buffer drops it (reference semantics: every
 * buffer stays valid until explicitly released) */
typedef struct {
    EbBufferHeaderTypeTpu hdr;  /* must be first: caller sees &hdr */
    PyObject *owner;
} PacketWrapTpu;

static int ensure_python(void) {
    if (!Py_IsInitialized()) {
        Py_InitializeEx(0);
    }
    return Py_IsInitialized() ? 0 : -1;
}

const char *svt_av1_get_version(void) { return "svt-av1-tpu-0.4"; }

EbErrorType svt_av1_enc_init_handle(EbComponentTypeTpu **handle,
                                    EbSvtAv1EncConfigurationTpu *cfg) {
    if (!handle || !cfg)
        return EB_ErrorBadParameter;
    EbComponentTypeTpu *h = calloc(1, sizeof(*h));
    if (!h)
        return EB_ErrorInsufficientResources;
    /* reference defaults (enc_settings.c:911 role) */
    cfg->qp = 35;
    cfg->enc_mode = 10;
    cfg->intra_period_length = -2;
    cfg->hierarchical_levels = 0;
    cfg->rate_control_mode = 0;
    cfg->target_bit_rate = 2000000;
    cfg->encoder_bit_depth = 8;
    h->cfg = *cfg;
    *handle = h;
    return EB_ErrorNone;
}

EbErrorType svt_av1_enc_set_parameter(EbComponentTypeTpu *h,
                                      EbSvtAv1EncConfigurationTpu *cfg) {
    if (!h || !cfg)
        return EB_ErrorBadParameter;
    h->cfg = *cfg;
    return EB_ErrorNone;
}

EbErrorType svt_av1_enc_init(EbComponentTypeTpu *h) {
    if (!h)
        return EB_ErrorBadParameter;
    if (ensure_python())
        return EB_ErrorInsufficientResources;
    PyGILState_STATE g = PyGILState_Ensure();
    PyObject *mod = PyImport_ImportModule("svt_av1_tpu.api.encoder");
    PyObject *cfgmod = PyImport_ImportModule("svt_av1_tpu.api.config");
    EbErrorType err = EB_ErrorInsufficientResources;
    if (mod && cfgmod) {
        PyObject *mkcfg = PyObject_GetAttrString(cfgmod, "EncoderConfig");
        PyObject *kw = Py_BuildValue(
            "{s:i,s:i,s:i,s:i,s:i,s:i,s:i,s:i,s:i}",
            "source_width", (int)h->cfg.source_width,
            "source_height", (int)h->cfg.source_height,
            "qp", (int)h->cfg.qp,
            "enc_mode", (int)h->cfg.enc_mode,
            "intra_period_length", (int)h->cfg.intra_period_length,
            "hierarchical_levels", (int)h->cfg.hierarchical_levels,
            "rate_control_mode", (int)h->cfg.rate_control_mode,
            "target_bit_rate", (int)h->cfg.target_bit_rate,
            "encoder_bit_depth", (int)h->cfg.encoder_bit_depth);
        PyObject *empty = PyTuple_New(0);
        PyObject *cfg = mkcfg ? PyObject_Call(mkcfg, empty, kw) : NULL;
        PyObject *enc_cls = PyObject_GetAttrString(mod, "Encoder");
        if (cfg && enc_cls) {
            h->encoder = PyObject_CallFunctionObjArgs(enc_cls, cfg,
                                                      NULL);
            if (h->encoder)
                err = EB_ErrorNone;
        }
        if (PyErr_Occurred())
            PyErr_Print();
        Py_XDECREF(cfg);
        Py_XDECREF(enc_cls);
        Py_XDECREF(mkcfg);
        Py_XDECREF(kw);
        Py_XDECREF(empty);
    }
    Py_XDECREF(mod);
    Py_XDECREF(cfgmod);
    PyGILState_Release(g);
    return err;
}

/* send one I420 picture: buf = contiguous Y then U then V planes */
EbErrorType svt_av1_enc_send_picture(EbComponentTypeTpu *h,
                                     EbBufferHeaderTypeTpu *pic) {
    if (!h || !h->encoder)
        return EB_ErrorBadParameter;
    PyGILState_STATE g = PyGILState_Ensure();
    uint32_t w = h->cfg.source_width, ht = h->cfg.source_height;
    int eos = pic == NULL || (pic->flags & 1);
    EbErrorType err = EB_ErrorNone;
    PyObject *res = NULL;
    if (pic && pic->p_buffer) {
        PyObject *np = PyImport_ImportModule("numpy");
        PyObject *frombuf = PyObject_GetAttrString(np, "frombuffer");
        Py_ssize_t ysz = (Py_ssize_t)w * ht;
        Py_ssize_t csz = (Py_ssize_t)((w + 1) / 2) * ((ht + 1) / 2);
        PyObject *ybytes = PyBytes_FromStringAndSize(
            (const char *)pic->p_buffer, ysz);
        PyObject *ubytes = PyBytes_FromStringAndSize(
            (const char *)pic->p_buffer + ysz, csz);
        PyObject *vbytes = PyBytes_FromStringAndSize(
            (const char *)pic->p_buffer + ysz + csz, csz);
        PyObject *yarr = PyObject_CallFunction(frombuf, "Os", ybytes,
                                               "uint8");
        PyObject *uarr = PyObject_CallFunction(frombuf, "Os", ubytes,
                                               "uint8");
        PyObject *varr = PyObject_CallFunction(frombuf, "Os", vbytes,
                                               "uint8");
        PyObject *yr = PyObject_CallMethod(yarr, "reshape", "(ii)",
                                           (int)ht, (int)w);
        PyObject *ur = PyObject_CallMethod(uarr, "reshape", "(ii)",
                                           (int)((ht + 1) / 2),
                                           (int)((w + 1) / 2));
        PyObject *vr = PyObject_CallMethod(varr, "reshape", "(ii)",
                                           (int)((ht + 1) / 2),
                                           (int)((w + 1) / 2));
        res = PyObject_CallMethod(h->encoder, "send_picture", "OOOi",
                                  yr, ur, vr, eos);
        Py_XDECREF(yr); Py_XDECREF(ur); Py_XDECREF(vr);
        Py_XDECREF(yarr); Py_XDECREF(uarr); Py_XDECREF(varr);
        Py_XDECREF(ybytes); Py_XDECREF(ubytes); Py_XDECREF(vbytes);
        Py_XDECREF(frombuf); Py_XDECREF(np);
        h->pts_in++;
    } else if (eos) {
        /* NULL-picture EOS (the standard flush pattern): drain the
         * pipeline so get_packet returns the tail frames */
        res = PyObject_CallMethod(h->encoder, "flush", NULL);
    }
    if (PyErr_Occurred()) {
        PyErr_Print();
        err = EB_ErrorBadParameter;
    }
    Py_XDECREF(res);
    PyGILState_Release(g);
    return err;
}

/* non-blocking packet fetch; returns EB_ErrorNone with *out = NULL
 * when no packet is ready */
EbErrorType svt_av1_enc_get_packet(EbComponentTypeTpu *h,
                                   EbBufferHeaderTypeTpu **out,
                                   uint8_t pic_send_done) {
    (void)pic_send_done;
    if (!h || !h->encoder || !out)
        return EB_ErrorBadParameter;
    *out = NULL;
    PyGILState_STATE g = PyGILState_Ensure();
    PyObject *pkt = PyObject_CallMethod(h->encoder, "get_packet", NULL);
    EbErrorType err = EB_ErrorNone;
    if (pkt && pkt != Py_None) {
        PyObject *data = PyObject_GetAttrString(pkt, "data");
        PyObject *pts = PyObject_GetAttrString(pkt, "pts");
        if (data && PyBytes_Check(data)) {
            PacketWrapTpu *b = calloc(1, sizeof(*b));
            b->hdr.p_buffer = (uint8_t *)PyBytes_AsString(data);
            b->hdr.n_filled_len = (uint32_t)PyBytes_Size(data);
            b->hdr.pts = pts ? (uint64_t)PyLong_AsLongLong(pts) : 0;
            Py_INCREF(data);
            b->owner = data;  /* keeps p_buffer alive until release */
            *out = &b->hdr;
        }
        Py_XDECREF(data);
        Py_XDECREF(pts);
    }
    if (PyErr_Occurred()) {
        PyErr_Print();
        err = EB_ErrorBadParameter;
    }
    Py_XDECREF(pkt);
    PyGILState_Release(g);
    return err;
}

EbErrorType svt_av1_enc_release_out_buffer(EbBufferHeaderTypeTpu **b) {
    if (b && *b) {
        PacketWrapTpu *w = (PacketWrapTpu *)*b;
        if (w->owner) {
            PyGILState_STATE g = PyGILState_Ensure();
            Py_CLEAR(w->owner);
            PyGILState_Release(g);
        }
        free(w);
        *b = NULL;
    }
    return EB_ErrorNone;
}

EbErrorType svt_av1_enc_deinit(EbComponentTypeTpu *h) {
    if (!h)
        return EB_ErrorBadParameter;
    if (h->encoder) {
        PyGILState_STATE g = PyGILState_Ensure();
        Py_CLEAR(h->encoder);
        PyGILState_Release(g);
    }
    return EB_ErrorNone;
}

EbErrorType svt_av1_enc_deinit_handle(EbComponentTypeTpu *h) {
    free(h);
    return EB_ErrorNone;
}
