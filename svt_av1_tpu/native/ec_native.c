/*
 * Native entropy-coding backend: daala od_ec range encoder + the
 * coefficient (txb) inner loop, as a CPython extension.
 *
 * Same normative algorithms as svt_av1_tpu/codec/entropy.py and
 * codec/coeff.py (which remain the reference implementation and test
 * mirror); this is the production host path — the analog of the
 * reference encoder's native EC stage (entropy_coding.c).
 *
 * CDF tables are passed as writable uint16 numpy buffers so adaptation
 * stays visible to the Python layer.
 */
#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <stdint.h>
#include <stdlib.h>
#include <string.h>

#define CDF_PROB_TOP 32768
#define EC_PROB_SHIFT 6
#define EC_MIN_PROB 4

/* ------------------------------------------------------------------ */
/* range encoder                                                       */
/* ------------------------------------------------------------------ */

typedef struct {
    uint32_t low;
    uint32_t rng;
    int32_t cnt;
    uint16_t *pre;     /* precarry buffer */
    size_t pre_len;
    size_t pre_cap;
} OdEc;

static void ec_reset(OdEc *e) {
    e->low = 0;
    e->rng = 0x8000;
    e->cnt = -9;
    e->pre_len = 0;
}

static void ec_grow(OdEc *e, size_t need) {
    if (e->pre_len + need > e->pre_cap) {
        size_t cap = e->pre_cap * 2 + need + 64;
        e->pre = (uint16_t *)realloc(e->pre, cap * sizeof(uint16_t));
        e->pre_cap = cap;
    }
}

static int ilog_nz(uint32_t x) {
    int n = 0;
    while (x) { n++; x >>= 1; }
    return n;
}

static void ec_normalize(OdEc *e, uint32_t low, uint32_t rng) {
    int d = 16 - ilog_nz(rng);
    int c = e->cnt;
    int s = c + d;
    if (s >= 0) {
        uint32_t m;
        ec_grow(e, 2);
        c += 16;
        m = ((uint32_t)1 << c) - 1;
        if (s >= 8) {
            e->pre[e->pre_len++] = (uint16_t)(low >> c);
            low &= m;
            c -= 8;
            m >>= 8;
        }
        e->pre[e->pre_len++] = (uint16_t)(low >> c);
        s = c + d - 24;
        low &= m;
    }
    e->low = low << d;
    e->rng = (rng << d) & 0xFFFF;
    e->cnt = s;
}

static void ec_encode_q15(OdEc *e, unsigned fl, unsigned fh, int s, int nsyms) {
    uint32_t l = e->low;
    uint32_t r = e->rng;
    const int n = nsyms - 1;
    if (fl < CDF_PROB_TOP) {
        unsigned u = ((r >> 8) * (fl >> EC_PROB_SHIFT) >> (7 - EC_PROB_SHIFT))
                     + EC_MIN_PROB * (n - (s - 1));
        unsigned v = ((r >> 8) * (fh >> EC_PROB_SHIFT) >> (7 - EC_PROB_SHIFT))
                     + EC_MIN_PROB * (n - s);
        l += r - u;
        r = u - v;
    } else {
        r -= ((r >> 8) * (fh >> EC_PROB_SHIFT) >> (7 - EC_PROB_SHIFT))
             + EC_MIN_PROB * (n - s);
    }
    ec_normalize(e, l, r);
}

static void ec_encode_symbol(OdEc *e, int s, const uint16_t *icdf, int nsyms) {
    ec_encode_q15(e, s > 0 ? icdf[s - 1] : CDF_PROB_TOP, icdf[s], s, nsyms);
}

static void ec_encode_bool(OdEc *e, int val, unsigned f) {
    uint32_t l = e->low;
    uint32_t r = e->rng;
    unsigned v = ((r >> 8) * (f >> EC_PROB_SHIFT) >> (7 - EC_PROB_SHIFT))
                 + EC_MIN_PROB;
    if (val) {
        l += r - v;
        r = v;
    } else {
        r -= v;
    }
    ec_normalize(e, l, r);
}

/* normative CDF adaptation (inverted convention, trailing counter) */
static void cdf_update(uint16_t *icdf, int val, int nsyms) {
    int count = icdf[nsyms];
    int speed = 0;
    {
        int t = nsyms, lg = 0;
        while (t > 1) { t >>= 1; lg++; }
        if (nsyms > (1 << lg)) lg++;   /* bit_length(nsyms) - 1 rounding */
    }
    /* rate = 3 + (count>15) + (count>31) + min(bitlen(nsyms)-1, 2) */
    {
        int bl = 0, t = nsyms;
        while (t) { bl++; t >>= 1; }
        speed = bl - 1;
        if (speed > 2) speed = 2;
    }
    {
        int rate = 3 + (count > 15) + (count > 31) + speed;
        int i;
        for (i = 0; i < nsyms - 1; i++) {
            int cur = icdf[i];
            if (i < val)
                icdf[i] = (uint16_t)(cur + ((CDF_PROB_TOP - cur) >> rate));
            else
                icdf[i] = (uint16_t)(cur - (cur >> rate));
        }
        icdf[nsyms] = (uint16_t)(count + (count < 32));
    }
}

static PyObject *ec_done_bytes(OdEc *e) {
    uint32_t l = e->low;
    int c = e->cnt;
    int s = 10 + c;
    uint32_t m = 0x3FFF;
    uint32_t eo = ((l + m) & ~m) | (m + 1);
    size_t n0;
    if (s > 0) {
        uint32_t n = ((uint32_t)1 << (c + 16)) - 1;
        ec_grow(e, (s + 7) >> 3);
        do {
            e->pre[e->pre_len++] = (uint16_t)(eo >> (c + 16));
            eo &= n;
            s -= 8;
            c -= 8;
            n >>= 8;
        } while (s > 0);
    }
    n0 = e->pre_len;
    {
        PyObject *out = PyBytes_FromStringAndSize(NULL, (Py_ssize_t)n0);
        unsigned char *buf = (unsigned char *)PyBytes_AS_STRING(out);
        uint32_t carry = 0;
        size_t i;
        for (i = n0; i-- > 0;) {
            uint32_t v = e->pre[i] + carry;
            buf[i] = (unsigned char)v;
            carry = v >> 8;
        }
        return out;
    }
}

/* ------------------------------------------------------------------ */
/* python object                                                       */
/* ------------------------------------------------------------------ */

typedef struct {
    PyObject_HEAD
    OdEc ec;
} EncObj;

static PyObject *Enc_new(PyTypeObject *type, PyObject *a, PyObject *k) {
    EncObj *self = (EncObj *)type->tp_alloc(type, 0);
    if (self) {
        memset(&self->ec, 0, sizeof(OdEc));
        ec_reset(&self->ec);
    }
    return (PyObject *)self;
}

static void Enc_dealloc(EncObj *self) {
    free(self->ec.pre);
    Py_TYPE(self)->tp_free((PyObject *)self);
}

static int get_u16_buffer(PyObject *obj, Py_buffer *view) {
    if (PyObject_GetBuffer(obj, view, PyBUF_C_CONTIGUOUS | PyBUF_WRITABLE))
        return -1;
    return 0;
}

static PyObject *Enc_encode_symbol(EncObj *self, PyObject *args) {
    int s, nsyms, update;
    PyObject *cdf_obj;
    Py_buffer view;
    if (!PyArg_ParseTuple(args, "iOip", &s, &cdf_obj, &nsyms, &update))
        return NULL;
    if (get_u16_buffer(cdf_obj, &view))
        return NULL;
    {
        uint16_t *cdf = (uint16_t *)view.buf;
        ec_encode_symbol(&self->ec, s, cdf, nsyms);
        if (update)
            cdf_update(cdf, s, nsyms);
    }
    PyBuffer_Release(&view);
    Py_RETURN_NONE;
}

static PyObject *Enc_encode_bool(EncObj *self, PyObject *args) {
    int val;
    unsigned f;
    if (!PyArg_ParseTuple(args, "iI", &val, &f))
        return NULL;
    ec_encode_bool(&self->ec, val, f);
    Py_RETURN_NONE;
}

static PyObject *Enc_encode_literal(EncObj *self, PyObject *args) {
    unsigned v;
    int bits, i;
    if (!PyArg_ParseTuple(args, "Ii", &v, &bits))
        return NULL;
    for (i = bits - 1; i >= 0; i--)
        ec_encode_bool(&self->ec, (v >> i) & 1, 16384);
    Py_RETURN_NONE;
}

static PyObject *Enc_done(EncObj *self, PyObject *noarg) {
    return ec_done_bytes(&self->ec);
}

static PyObject *Enc_tell_bits(EncObj *self, PyObject *noarg) {
    return PyLong_FromLong(self->ec.cnt + 10 + (long)self->ec.pre_len * 8);
}

/* ------------------------------------------------------------------ */
/* coefficient block encoding (the hot loop)                           */
/* ------------------------------------------------------------------ */

#define TX_CLASS_2D 0
#define TX_CLASS_HORIZ 1
#define TX_CLASS_VERT 2
#define NUM_BASE_LEVELS 2
#define COEFF_BASE_RANGE 12
#define BR_CDF_SIZE 4
#define COEFF_CONTEXT_BITS 6
#define COEFF_CONTEXT_MASK 63
#define TX_PAD_HOR 4

static const int16_t k_eob_group_start[12] =
    {0, 1, 2, 3, 5, 9, 17, 33, 65, 129, 257, 513};
static const int16_t k_eob_offset_bits[12] =
    {0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9};

static int eob_pos_token(int eob, int *extra) {
    int t;
    if (eob < 2) t = eob;
    else if (eob < 3) t = 2;
    else if (eob < 5) t = 3;
    else if (eob < 9) t = 4;
    else if (eob < 17) t = 5;
    else if (eob < 33) t = 6;
    else if (eob < 65) t = 7;
    else if (eob < 129) t = 8;
    else if (eob < 257) t = 9;
    else if (eob < 513) t = 10;
    else t = 11;
    *extra = eob - k_eob_group_start[t];
    return t;
}

static int clip3u(int v, int hi) { return v > hi ? hi : v; }

/* base-level context from padded levels */
static int nz_ctx(const uint8_t *levels, int stride, int pos, int bwl,
                  int wlog_mask, const int8_t *ctx_offsets, int tx_class) {
    int row = pos >> bwl;
    int col = pos & wlog_mask;
    const uint8_t *lv = levels + row * stride + col;
    int mag;
    if (tx_class == TX_CLASS_2D) {
        if (pos == 0) return 0;
        mag = clip3u(lv[1], 3) + clip3u(lv[stride], 3)
            + clip3u(lv[stride + 1], 3) + clip3u(lv[2], 3)
            + clip3u(lv[2 * stride], 3);
        return ((mag + 1) >> 1 > 4 ? 4 : (mag + 1) >> 1) + ctx_offsets[pos];
    } else if (tx_class == TX_CLASS_VERT) {
        mag = clip3u(lv[1], 3) + clip3u(lv[stride], 3)
            + clip3u(lv[2 * stride], 3) + clip3u(lv[3 * stride], 3)
            + clip3u(lv[4 * stride], 3);
        mag = (mag + 1) >> 1;
        if (mag > 4) mag = 4;
        return mag + (row == 0 ? 26 : (row == 1 ? 31 : 36));
    } else {
        mag = clip3u(lv[1], 3) + clip3u(lv[stride], 3)
            + clip3u(lv[2], 3) + clip3u(lv[3], 3) + clip3u(lv[4], 3);
        mag = (mag + 1) >> 1;
        if (mag > 4) mag = 4;
        return mag + (col == 0 ? 26 : (col == 1 ? 31 : 36));
    }
}

static int br_ctx_fn(const uint8_t *levels, int stride, int pos, int bwl,
                     int tx_class) {
    int row = pos >> bwl;
    int col = pos - (row << bwl);
    const uint8_t *lv = levels + row * stride + col;
    int mag = lv[1] + lv[stride];
    if (tx_class == TX_CLASS_2D) {
        mag += lv[stride + 1];
        mag = (mag + 1) >> 1;
        if (mag > 6) mag = 6;
        if (pos == 0) return mag;
        if (row < 2 && col < 2) return mag + 7;
    } else if (tx_class == TX_CLASS_HORIZ) {
        mag += lv[2];
        mag = (mag + 1) >> 1;
        if (mag > 6) mag = 6;
        if (pos == 0) return mag;
        if (col == 0) return mag + 7;
    } else {
        mag += lv[2 * stride];
        mag = (mag + 1) >> 1;
        if (mag > 6) mag = 6;
        if (pos == 0) return mag;
        if (row == 0) return mag + 7;
    }
    return mag + 14;
}

static void write_golomb(OdEc *e, int level) {
    int x = level + 1;
    int length = 0, i, t = x;
    while (t) { length++; t >>= 1; }
    for (i = 0; i < length - 1; i++) ec_encode_bool(e, 0, 16384);
    for (i = length - 1; i >= 0; i--)
        ec_encode_bool(e, (x >> i) & 1, 16384);
}

/*
 * encode_txb(qcoeff_u8buf(int32 kh*kw), scan(int16 n), ctx_offsets(int8),
 *            kh, kw, bwl, tx_class, eob_multi_size,
 *            txb_skip_cdf, eob_cdf, eob_extra_cdf, dc_sign_cdf,
 *            base_cdf(2d 42x(5)), base_eob_cdf(4x4), br_cdf(21x5),
 *            txb_skip_ctx, dc_sign_ctx, update) -> cul_level
 * Also emits txb_skip; tx-type signaling is done by the Python caller
 * via the returned needs_tx_type flag protocol: this function only
 * handles blocks where tx_type syntax was already interleaved by
 * calling with skip_txb_skip... — simpler: caller passes a callable? No:
 * the caller encodes txb_skip itself and calls us only for eob > 0
 * after writing tx_type.  We encode from eob coding onward.
 */
static PyObject *Enc_encode_coeffs(EncObj *self, PyObject *args) {
    PyObject *q_obj, *scan_obj, *off_obj;
    PyObject *eob_cdf_o, *eob_extra_o, *dc_sign_o, *base_o, *base_eob_o,
        *br_o;
    int kh, kw, bwl, tx_class, eob_multi_size, dc_sign_ctx, update, eob;
    if (!PyArg_ParseTuple(
            args, "OOOiiiiiOOOOOOiip", &q_obj, &scan_obj, &off_obj, &kh, &kw,
            &bwl, &tx_class, &eob_multi_size, &eob_cdf_o, &eob_extra_o,
            &dc_sign_o, &base_o, &base_eob_o, &br_o, &eob, &dc_sign_ctx,
            &update))
        return NULL;

    Py_buffer qv, sv, ov, eobv, eobxv, dcv, basev, beobv, brv;
    if (PyObject_GetBuffer(q_obj, &qv, PyBUF_C_CONTIGUOUS)) return NULL;
    if (PyObject_GetBuffer(scan_obj, &sv, PyBUF_C_CONTIGUOUS)) return NULL;
    if (PyObject_GetBuffer(off_obj, &ov, PyBUF_C_CONTIGUOUS)) return NULL;
    if (get_u16_buffer(eob_cdf_o, &eobv)) return NULL;
    if (get_u16_buffer(eob_extra_o, &eobxv)) return NULL;
    if (get_u16_buffer(dc_sign_o, &dcv)) return NULL;
    if (get_u16_buffer(base_o, &basev)) return NULL;
    if (get_u16_buffer(base_eob_o, &beobv)) return NULL;
    if (get_u16_buffer(br_o, &brv)) return NULL;

    const int32_t *q = (const int32_t *)qv.buf;
    const int16_t *scan = (const int16_t *)sv.buf;
    const int8_t *offs = (const int8_t *)ov.buf;
    uint16_t *eob_cdf = (uint16_t *)eobv.buf;
    uint16_t *eob_extra_tab = (uint16_t *)eobxv.buf;  /* (22, w) by eob_pt */
    int eob_extra_w = (int)(eobxv.len / sizeof(uint16_t) / 22);
    uint16_t *dc_sign_cdf = (uint16_t *)dcv.buf;
    uint16_t *base_cdf = (uint16_t *)basev.buf;       /* (42, base_w) */
    uint16_t *base_eob_cdf = (uint16_t *)beobv.buf;   /* (4, beob_w) */
    uint16_t *br_cdf = (uint16_t *)brv.buf;           /* (21, br_w) */
    int base_w = (int)(basev.len / sizeof(uint16_t) / 42);
    int beob_w = (int)(beobv.len / sizeof(uint16_t) / 4);
    int br_w = (int)(brv.len / sizeof(uint16_t) / 21);

    OdEc *e = &self->ec;
    int stride = kw + TX_PAD_HOR;
    uint8_t levels_buf[(32 + 4) * (32 + 4)];
    memset(levels_buf, 0, sizeof(levels_buf));
    {
        int r, c;
        for (r = 0; r < kh; r++)
            for (c = 0; c < kw; c++) {
                int32_t v = q[r * kw + c];
                int a = v < 0 ? -v : v;
                levels_buf[r * stride + c] = (uint8_t)(a > 127 ? 127 : a);
            }
    }

    /* eob token */
    {
        int extra;
        int eob_pt = eob_pos_token(eob, &extra);
        int nsyms = eob_multi_size + 5;
        ec_encode_symbol(e, eob_pt - 1, eob_cdf, nsyms);
        if (update) cdf_update(eob_cdf, eob_pt - 1, nsyms);
        {
            int ebits = k_eob_offset_bits[eob_pt];
            if (ebits > 0) {
                uint16_t *eob_extra_cdf = eob_extra_tab
                                          + eob_pt * eob_extra_w;
                int shift = ebits - 1;
                int bit = (extra >> shift) & 1;
                ec_encode_symbol(e, bit, eob_extra_cdf, 2);
                if (update) cdf_update(eob_extra_cdf, bit, 2);
                {
                    int i;
                    for (i = 1; i < ebits; i++) {
                        shift = ebits - 1 - i;
                        ec_encode_bool(e, (extra >> shift) & 1, 16384);
                    }
                }
            }
        }
    }

    /* base + br, reverse scan */
    {
        int c;
        int wmask = kw - 1;
        for (c = eob - 1; c >= 0; c--) {
            int pos = scan[c];
            int32_t v = q[pos];
            int level = v < 0 ? -v : v;
            if (c == eob - 1) {
                int ctx;
                if (c == 0) ctx = 0;
                else if (c <= (kh * kw) / 8) ctx = 1;
                else if (c <= (kh * kw) / 4) ctx = 2;
                else ctx = 3;
                {
                    int s = (level < 3 ? level : 3) - 1;
                    uint16_t *cdf = base_eob_cdf + ctx * beob_w;
                    ec_encode_symbol(e, s, cdf, 3);
                    if (update) cdf_update(cdf, s, 3);
                }
            } else {
                int ctx = nz_ctx(levels_buf, stride, pos, bwl, wmask, offs,
                                 tx_class);
                int s = level < 3 ? level : 3;
                uint16_t *cdf = base_cdf + ctx * base_w;
                ec_encode_symbol(e, s, cdf, 4);
                if (update) cdf_update(cdf, s, 4);
            }
            if (level > NUM_BASE_LEVELS) {
                int base_range = level - 1 - NUM_BASE_LEVELS;
                int bctx = br_ctx_fn(levels_buf, stride, pos, bwl, tx_class);
                uint16_t *cdf = br_cdf + bctx * br_w;
                int idx;
                for (idx = 0; idx < COEFF_BASE_RANGE; idx += BR_CDF_SIZE - 1) {
                    int k = base_range - idx;
                    if (k > BR_CDF_SIZE - 1) k = BR_CDF_SIZE - 1;
                    ec_encode_symbol(e, k, cdf, BR_CDF_SIZE);
                    if (update) cdf_update(cdf, k, BR_CDF_SIZE);
                    if (k < BR_CDF_SIZE - 1) break;
                }
            }
        }
    }

    /* signs + golomb */
    {
        int c;
        int cul = 0;
        int32_t dc = q[0];
        for (c = 0; c < eob; c++) {
            int pos = scan[c];
            int32_t v = q[pos];
            int level = v < 0 ? -v : v;
            cul += level;
            if (level) {
                int sign = v < 0;
                if (c == 0) {
                    ec_encode_symbol(e, sign, dc_sign_cdf, 2);
                    if (update) cdf_update(dc_sign_cdf, sign, 2);
                } else {
                    ec_encode_bool(e, sign, 16384);
                }
                if (level > COEFF_BASE_RANGE + NUM_BASE_LEVELS)
                    write_golomb(e, level - COEFF_BASE_RANGE - 1
                                        - NUM_BASE_LEVELS);
            }
        }
        if (cul > COEFF_CONTEXT_MASK) cul = COEFF_CONTEXT_MASK;
        if (dc < 0) cul |= 1 << COEFF_CONTEXT_BITS;
        else if (dc > 0) cul += 2 << COEFF_CONTEXT_BITS;

        PyBuffer_Release(&qv);
        PyBuffer_Release(&sv);
        PyBuffer_Release(&ov);
        PyBuffer_Release(&eobv);
        PyBuffer_Release(&eobxv);
        PyBuffer_Release(&dcv);
        PyBuffer_Release(&basev);
        PyBuffer_Release(&beobv);
        PyBuffer_Release(&brv);
        return PyLong_FromLong(cul);
    }
}

static PyMethodDef Enc_methods[] = {
    {"encode_symbol", (PyCFunction)Enc_encode_symbol, METH_VARARGS, NULL},
    {"encode_bool", (PyCFunction)Enc_encode_bool, METH_VARARGS, NULL},
    {"encode_literal", (PyCFunction)Enc_encode_literal, METH_VARARGS, NULL},
    {"encode_coeffs", (PyCFunction)Enc_encode_coeffs, METH_VARARGS, NULL},
    {"done", (PyCFunction)Enc_done, METH_NOARGS, NULL},
    {"tell_bits", (PyCFunction)Enc_tell_bits, METH_NOARGS, NULL},
    {NULL, NULL, 0, NULL}};

static PyTypeObject EncType = {
    PyVarObject_HEAD_INIT(NULL, 0)
    .tp_name = "ec_native.RangeEncoder",
    .tp_basicsize = sizeof(EncObj),
    .tp_flags = Py_TPFLAGS_DEFAULT,
    .tp_new = Enc_new,
    .tp_dealloc = (destructor)Enc_dealloc,
    .tp_methods = Enc_methods,
};

static PyModuleDef ecmodule = {
    PyModuleDef_HEAD_INIT, "ec_native", NULL, -1, NULL};

PyMODINIT_FUNC PyInit_ec_native(void) {
    PyObject *m;
    if (PyType_Ready(&EncType) < 0)
        return NULL;
    m = PyModule_Create(&ecmodule);
    if (!m)
        return NULL;
    Py_INCREF(&EncType);
    PyModule_AddObject(m, "RangeEncoder", (PyObject *)&EncType);
    return m;
}
