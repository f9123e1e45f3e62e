/* C fast path for the content-stream interpreter loop.
 *
 * This is a line-for-line transcription of parse_and_run's fused
 * tokenize+parse+interpret loop (content.py) into C with the CPython API,
 * covering fast-show mode AND (since round 6) layout mode — positioned
 * TextFragment emission mirroring Interpreter._emit_fragment, with the
 * ActualText pending branch delegated to interp._pending_absorb and the
 * marked-content environment re-read after every callback that can move
 * it.  Semantics are
 * pinned by the same differential tests that pin the Python loop against
 * run(parse_content(data)): the scanner reproduces _MASTER_FAST's generic
 * token classes (the macro alternatives are pure-Python speed devices —
 * macro == generic-token semantics is itself pinned), the operator
 * handlers mirror the Python branches one-for-one, and everything the C
 * loop cannot express natively (XObject paint, marked-content props,
 * inline-image scan, cold run decode) calls back into the SAME Python
 * methods with the SAME state write-back/read-back discipline the Python
 * loop uses around those calls.
 *
 * Reference lineage (same as the Python loop): oxidize-pdf-core
 * content.rs operator semantics + extraction.rs show-text math.
 */
#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <structmember.h>
#include <string.h>
#include <strings.h>
#include <stdlib.h>
#include <ctype.h>
#include <math.h>

/* ---- module-level objects installed by setup() ------------------------- */
static PyObject *g_AO, *g_AC, *g_DO, *g_DC;  /* marker singletons */
static PyObject *g_name_memo;                /* content._NAME_MEMO */
static PyObject *g_decode_name;              /* content._decode_name */
static PyObject *g_inline_tok;               /* content._InlineTok */
static PyObject *g_hexval;                   /* content._hexval (error parity) */
static PyObject *g_bi_helper;                /* content._c_bi */
static PyObject *g_bdc_helper;               /* content._c_bdc */
static PyObject *g_nl, *g_sp, *g_empty;      /* "\n", " ", "" */
static PyObject *g_gray, *g_rgb, *g_cmyk;    /* color space tags */
/* layout stage (setup_layout): fragment emission for preserve_layout /
 * reading-order pages — NULL until installed */
static PyObject *g_frag_cls;    /* layout.TextFragment */
static PyObject *g_font_style;  /* layout.parse_font_style */
static PyObject *g_frag_env;    /* content._c_frag_env */

/* interned attribute names */
static PyObject *a_state, *a_options, *a_in_text, *a_total, *a_last_x,
    *a_last_y, *a_last_char, *a_text_parts, *a_font_memo, *a_decode,
    *a_set_font_memo, *a_paint_xobject, *a_op_bmc, *a_op_emc,
    *a_next_line_show, *a_text_matrix, *a_text_line_matrix, *a_ctm,
    *a_leading, *a_char_space, *a_word_space, *a_horizontal_scale,
    *a_text_rise, *a_font_size, *a_font_name, *a_render_mode,
    *a_fill_color, *a_saved, *a_artifact_n, *a_newline_threshold,
    *a_space_threshold, *a_tj_space_threshold, *a_include_artifacts,
    *a_layout, *a_fragments, *a_pending_absorb;

/* ---- operand stack ------------------------------------------------------ */
enum { V_NUM = 0, V_STR = 1, V_NAME = 2, V_MARK = 3, V_OBJ = 4 };

typedef struct {
    unsigned char tag;
    unsigned char is_int;
    unsigned char ival_ok;
    double num;
    long long ival;
    const unsigned char *ptr;  /* V_STR view / V_NUM token text */
    Py_ssize_t len;
    PyObject *obj;  /* owned: V_NAME str, V_OBJ, V_STR owned bytes, V_MARK */
} Val;

typedef struct {
    PyObject *interp, *st, *opts, *data_obj, *resources;
    const unsigned char *data;
    Py_ssize_t n;
    int depth;
    double nl_thr, sp_thr, tj_thr;
    int inc_art;
    /* hot state (the Python loop's locals) */
    double la1, la2, la3, la4, lt4, lt5, tt4, tt5;
    double ctm[6];
    int ctm_ident;
    double fs, hs, l_sp;
    int in_text, noart;
    long long total;
    double lastx, lasty;
    Py_UCS4 lastc; /* 0 == "" */
    PyObject *text_parts, *font_memo, *saved, *fill_color, *decode_meth;
    PyObject *tf_name; /* current st.font_name (owned): Tf ops naming the
                        * SAME memoized name object at the same size are
                        * observationally idempotent and skip the Python
                        * _set_font_memo round-trip (31.6k Tf ops on the
                        * Cold_Email fixture, overwhelmingly redundant) */
    /* layout stage (only populated when c->layout): fragment emission
     * state — everything Interpreter._emit_fragment reads, cached with
     * the same write-back/re-read discipline as the counters */
    int layout;
    PyObject *fragments;   /* interp.fragments (owned) */
    PyObject *font_name;   /* st.font_name (owned; may be Py_None) */
    int fbold, fital;      /* parse_font_style(font_name) memo */
    PyObject *cur_mcid;    /* _innermost_mc_tag(st.mc_stack) (owned) */
    PyObject *cur_tag;     /* ... (owned) */
    PyObject *pending;     /* st.pending_actualtext (owned; may be None) */
    double xsc, ysc;       /* Tm×CTM x/y scale (lazy, scale_dirty) */
    int scale_dirty;
    Val *stk;
    Py_ssize_t sp, cap;
} Ctx;

static int stack_push(Ctx *c, Val v)
{
    if (c->sp >= c->cap) {
        Py_ssize_t ncap = c->cap ? c->cap * 2 : 64;
        Val *ns = (Val *)realloc(c->stk, ncap * sizeof(Val));
        if (!ns) {
            Py_XDECREF(v.obj);
            PyErr_NoMemory();
            return -1;
        }
        c->stk = ns;
        c->cap = ncap;
    }
    c->stk[c->sp++] = v;
    return 0;
}

static void stack_clear(Ctx *c)
{
    while (c->sp > 0)
        Py_XDECREF(c->stk[--c->sp].obj);
}

/* ---- small helpers ------------------------------------------------------ */
static int get_f(PyObject *o, PyObject *name, double *out)
{
    PyObject *v = PyObject_GetAttr(o, name);
    if (!v)
        return -1;
    double d = PyFloat_AsDouble(v);
    Py_DECREF(v);
    if (d == -1.0 && PyErr_Occurred())
        return -1;
    *out = d;
    return 0;
}

static int set_f(PyObject *o, PyObject *name, double v)
{
    PyObject *f = PyFloat_FromDouble(v);
    if (!f)
        return -1;
    int r = PyObject_SetAttr(o, name, f);
    Py_DECREF(f);
    return r;
}

static PyObject *tuple6(double a, double b, double cc, double d, double e,
                        double f)
{
    PyObject *t = PyTuple_New(6);
    if (!t)
        return NULL;
    double v[6] = {a, b, cc, d, e, f};
    for (int i = 0; i < 6; i++) {
        PyObject *x = PyFloat_FromDouble(v[i]);
        if (!x) {
            Py_DECREF(t);
            return NULL;
        }
        PyTuple_SET_ITEM(t, i, x);
    }
    return t;
}

static int read_mat6(PyObject *o, PyObject *name, double out[6])
{
    PyObject *t = PyObject_GetAttr(o, name);
    if (!t)
        return -1;
    if (!PyTuple_Check(t) || PyTuple_GET_SIZE(t) != 6) {
        Py_DECREF(t);
        PyErr_SetString(PyExc_TypeError, "matrix is not a 6-tuple");
        return -1;
    }
    for (int i = 0; i < 6; i++) {
        out[i] = PyFloat_AsDouble(PyTuple_GET_ITEM(t, i));
        if (out[i] == -1.0 && PyErr_Occurred()) {
            Py_DECREF(t);
            return -1;
        }
    }
    Py_DECREF(t);
    return 0;
}

static int set_matrices(Ctx *c)
{
    PyObject *tm = tuple6(c->la1, c->la2, c->la3, c->la4, c->tt4, c->tt5);
    if (!tm)
        return -1;
    int r = PyObject_SetAttr(c->st, a_text_matrix, tm);
    Py_DECREF(tm);
    if (r < 0)
        return -1;
    PyObject *tlm = tuple6(c->la1, c->la2, c->la3, c->la4, c->lt4, c->lt5);
    if (!tlm)
        return -1;
    r = PyObject_SetAttr(c->st, a_text_line_matrix, tlm);
    Py_DECREF(tlm);
    return r;
}

static PyObject *lastc_obj(Ctx *c)
{
    if (c->lastc == 0) {
        Py_INCREF(g_empty);
        return g_empty;
    }
    if (c->lastc == '\n') {
        Py_INCREF(g_nl);
        return g_nl;
    }
    if (c->lastc == ' ') {
        Py_INCREF(g_sp);
        return g_sp;
    }
    return PyUnicode_FromOrdinal((int)c->lastc);
}

static int sync_counters_out(Ctx *c)
{
    PyObject *t = PyLong_FromLongLong(c->total);
    if (!t)
        return -1;
    int r = PyObject_SetAttr(c->interp, a_total, t);
    Py_DECREF(t);
    if (r < 0)
        return -1;
    if (set_f(c->interp, a_last_x, c->lastx) < 0)
        return -1;
    if (set_f(c->interp, a_last_y, c->lasty) < 0)
        return -1;
    PyObject *lc = lastc_obj(c);
    if (!lc)
        return -1;
    r = PyObject_SetAttr(c->interp, a_last_char, lc);
    Py_DECREF(lc);
    return r;
}

static int sync_out(Ctx *c) /* matrices + counters (the pre-call sync) */
{
    if (set_matrices(c) < 0)
        return -1;
    return sync_counters_out(c);
}

static int read_lastc(Ctx *c)
{
    PyObject *lc = PyObject_GetAttr(c->interp, a_last_char);
    if (!lc)
        return -1;
    if (!PyUnicode_Check(lc)) {
        Py_DECREF(lc);
        PyErr_SetString(PyExc_TypeError, "_last_char not a str");
        return -1;
    }
    Py_ssize_t l = PyUnicode_GET_LENGTH(lc);
    c->lastc = l ? PyUnicode_ReadChar(lc, l - 1) : 0;
    Py_DECREF(lc);
    return 0;
}

static int resync_in(Ctx *c) /* counters + matrices (the post-call re-read) */
{
    PyObject *t = PyObject_GetAttr(c->interp, a_total);
    if (!t)
        return -1;
    c->total = PyLong_AsLongLong(t);
    Py_DECREF(t);
    if (c->total == -1 && PyErr_Occurred())
        return -1;
    if (get_f(c->interp, a_last_x, &c->lastx) < 0)
        return -1;
    if (get_f(c->interp, a_last_y, &c->lasty) < 0)
        return -1;
    if (read_lastc(c) < 0)
        return -1;
    double m[6];
    if (read_mat6(c->st, a_text_line_matrix, m) < 0)
        return -1;
    c->la1 = m[0];
    c->la2 = m[1];
    c->la3 = m[2];
    c->la4 = m[3];
    c->lt4 = m[4];
    c->lt5 = m[5];
    if (read_mat6(c->st, a_text_matrix, m) < 0)
        return -1;
    c->tt4 = m[4];
    c->tt5 = m[5];
    return 0;
}

static int read_noart(Ctx *c)
{
    PyObject *an = PyObject_GetAttr(c->st, a_artifact_n);
    if (!an)
        return -1;
    long v = PyLong_AsLong(an);
    Py_DECREF(an);
    if (v == -1 && PyErr_Occurred())
        return -1;
    c->noart = (v == 0) || c->inc_art;
    return 0;
}

static void update_ctm_ident(Ctx *c)
{
    c->ctm_ident = (c->ctm[0] == 1.0 && c->ctm[1] == 0.0 &&
                    c->ctm[2] == 0.0 && c->ctm[3] == 1.0 &&
                    c->ctm[4] == 0.0 && c->ctm[5] == 0.0);
}

/* ---- CFrag: C-native positioned text run ------------------------------- *
 * Attribute-compatible with layout.TextFragment (same 12 fields, same
 * construction order) but built by PyObject_New with direct member
 * writes: ~10x cheaper than calling the Python class per show run, which
 * matters at ~3 fragments/word on TJ-kerned documents.  Python layout
 * passes read the members transparently (T_* descriptors); the pure-
 * Python engine keeps producing TextFragment — consumers duck-type. */

typedef struct {
    PyObject_HEAD
    PyObject *text, *font_name, *color, *mcid, *struct_tag;
    double x, y, width, height, font_size;
    char is_bold, is_italic;
} CFrag;

static PyTypeObject CFragType; /* forward */

static void CFrag_dealloc(CFrag *self)
{
    Py_XDECREF(self->text);
    Py_XDECREF(self->font_name);
    Py_XDECREF(self->color);
    Py_XDECREF(self->mcid);
    Py_XDECREF(self->struct_tag);
    Py_TYPE(self)->tp_free((PyObject *)self);
}

static PyMemberDef CFrag_members[] = {
    {"text", T_OBJECT_EX, offsetof(CFrag, text), 0, NULL},
    {"x", T_DOUBLE, offsetof(CFrag, x), 0, NULL},
    {"y", T_DOUBLE, offsetof(CFrag, y), 0, NULL},
    {"width", T_DOUBLE, offsetof(CFrag, width), 0, NULL},
    {"height", T_DOUBLE, offsetof(CFrag, height), 0, NULL},
    {"font_size", T_DOUBLE, offsetof(CFrag, font_size), 0, NULL},
    {"font_name", T_OBJECT_EX, offsetof(CFrag, font_name), 0, NULL},
    {"is_bold", T_BOOL, offsetof(CFrag, is_bold), 0, NULL},
    {"is_italic", T_BOOL, offsetof(CFrag, is_italic), 0, NULL},
    {"color", T_OBJECT_EX, offsetof(CFrag, color), 0, NULL},
    {"mcid", T_OBJECT_EX, offsetof(CFrag, mcid), 0, NULL},
    {"struct_tag", T_OBJECT_EX, offsetof(CFrag, struct_tag), 0, NULL},
    {NULL, 0, 0, 0, NULL},
};

static int CFrag_init(CFrag *self, PyObject *args, PyObject *kwds)
{
    static char *kwlist[] = {
        "text", "x", "y", "width", "height", "font_size", "font_name",
        "is_bold", "is_italic", "color", "mcid", "struct_tag", NULL,
    };
    PyObject *text, *font_name = Py_None, *color = Py_None,
        *mcid = Py_None, *struct_tag = Py_None;
    double x = 0.0, y = 0.0, width = 0.0, height = 0.0, font_size = 0.0;
    int is_bold = 0, is_italic = 0;
    if (!PyArg_ParseTupleAndKeywords(
            args, kwds, "O|dddddOppOOO", kwlist, &text, &x, &y, &width,
            &height, &font_size, &font_name, &is_bold, &is_italic, &color,
            &mcid, &struct_tag))
        return -1;
    Py_INCREF(text);
    Py_INCREF(font_name);
    Py_INCREF(color);
    Py_INCREF(mcid);
    Py_INCREF(struct_tag);
    Py_XDECREF(self->text);
    Py_XDECREF(self->font_name);
    Py_XDECREF(self->color);
    Py_XDECREF(self->mcid);
    Py_XDECREF(self->struct_tag);
    self->text = text;
    self->font_name = font_name;
    self->color = color;
    self->mcid = mcid;
    self->struct_tag = struct_tag;
    self->x = x;
    self->y = y;
    self->width = width;
    self->height = height;
    self->font_size = font_size;
    self->is_bold = (char)is_bold;
    self->is_italic = (char)is_italic;
    return 0;
}

/* fresh CFrag with all object fields NULL-safe-initialized; caller fills */
static CFrag *cfrag_alloc(void)
{
    CFrag *f = PyObject_New(CFrag, &CFragType);
    if (!f)
        return NULL;
    f->text = NULL;
    f->font_name = NULL;
    f->color = NULL;
    f->mcid = NULL;
    f->struct_tag = NULL;
    f->x = f->y = f->width = f->height = f->font_size = 0.0;
    f->is_bold = f->is_italic = 0;
    return f;
}

static PyObject *CFrag_clone(CFrag *self, PyObject *ignored)
{
    CFrag *f = cfrag_alloc();
    if (!f)
        return NULL;
    Py_XINCREF(self->text);
    Py_XINCREF(self->font_name);
    Py_XINCREF(self->color);
    Py_XINCREF(self->mcid);
    Py_XINCREF(self->struct_tag);
    f->text = self->text;
    f->font_name = self->font_name;
    f->color = self->color;
    f->mcid = self->mcid;
    f->struct_tag = self->struct_tag;
    f->x = self->x;
    f->y = self->y;
    f->width = self->width;
    f->height = self->height;
    f->font_size = self->font_size;
    f->is_bold = self->is_bold;
    f->is_italic = self->is_italic;
    return (PyObject *)f;
}

static PyObject *CFrag_repr(CFrag *self)
{
    PyObject *fx = PyFloat_FromDouble(self->x);
    PyObject *fy = PyFloat_FromDouble(self->y);
    PyObject *fw = PyFloat_FromDouble(self->width);
    PyObject *r = NULL;
    if (fx && fy && fw)
        r = PyUnicode_FromFormat(
            "TextFragment(%R @ %S,%S w=%S)",
            self->text ? self->text : Py_None, fx, fy, fw);
    Py_XDECREF(fx);
    Py_XDECREF(fy);
    Py_XDECREF(fw);
    return r;
}

static PyMethodDef CFrag_methods[] = {
    {"clone", (PyCFunction)CFrag_clone, METH_NOARGS, "copy the fragment"},
    {NULL, NULL, 0, NULL},
};

static PyTypeObject CFragType = {
    PyVarObject_HEAD_INIT(NULL, 0)
    .tp_name = "oxpdf_cscan.CFrag",
    .tp_basicsize = sizeof(CFrag),
    .tp_dealloc = (destructor)CFrag_dealloc,
    .tp_repr = (reprfunc)CFrag_repr,
    .tp_flags = Py_TPFLAGS_DEFAULT,
    .tp_doc = "C-native TextFragment (attribute-compatible)",
    .tp_methods = CFrag_methods,
    .tp_members = CFrag_members,
    .tp_init = (initproc)CFrag_init,
    .tp_new = PyType_GenericNew,
};

/* ---- layout stage: fragment emission (Interpreter._emit_fragment) ------ */

/* text-space origin: translation row of Tm × CTM (state.origin()).
 * ALWAYS the full expression — the identity-CTM shortcut used by the
 * fast-show synthesis is equal except for the SIGN of a zero origin
 * (-0.0*1.0 stays -0.0, but -0.0 + 0.0 is +0.0), and fragments expose
 * x/y directly where last_x only ever adds them. */
static void origin_xy(Ctx *c, double *x, double *y)
{
    *x = c->tt4 * c->ctm[0] + c->tt5 * c->ctm[2] + c->ctm[4];
    *y = c->tt4 * c->ctm[1] + c->tt5 * c->ctm[3] + c->ctm[5];
}

/* lazy Tm×CTM scale factors (_emit_fragment's combined matrix): a..d of
 * the text matrix change only at Tm/BT, the CTM at cm/Q/Do — shows only
 * translate, so the scales are loop-invariant between those sites */
static void ensure_scales(Ctx *c)
{
    if (!c->scale_dirty)
        return;
    double c0 = c->la1 * c->ctm[0] + c->la2 * c->ctm[2];
    double c1 = c->la1 * c->ctm[1] + c->la2 * c->ctm[3];
    double c2 = c->la3 * c->ctm[0] + c->la4 * c->ctm[2];
    double c3 = c->la3 * c->ctm[1] + c->la4 * c->ctm[3];
    c->xsc = sqrt(c0 * c0 + c1 * c1);
    c->ysc = sqrt(c2 * c2 + c3 * c3);
    c->scale_dirty = 0;
}

/* re-read (mcid, struct_tag, pending_actualtext) via content._c_frag_env —
 * after any callback that can touch mc_stack or the ActualText pending
 * (BMC/BDC/EMC/Do) and at entry */
static int refresh_frag_env(Ctx *c)
{
    PyObject *r = PyObject_CallOneArg(g_frag_env, c->interp);
    if (!r)
        return -1;
    if (!PyTuple_Check(r) || PyTuple_GET_SIZE(r) != 3) {
        Py_DECREF(r);
        PyErr_SetString(PyExc_TypeError, "frag env not a 3-tuple");
        return -1;
    }
    PyObject *mcid = PyTuple_GET_ITEM(r, 0);
    PyObject *tag = PyTuple_GET_ITEM(r, 1);
    PyObject *pend = PyTuple_GET_ITEM(r, 2);
    Py_INCREF(mcid);
    Py_INCREF(tag);
    Py_INCREF(pend);
    Py_XDECREF(c->cur_mcid);
    Py_XDECREF(c->cur_tag);
    Py_XDECREF(c->pending);
    c->cur_mcid = mcid;
    c->cur_tag = tag;
    c->pending = pend;
    Py_DECREF(r);
    return 0;
}

/* re-read st.font_name + its parse_font_style memo — at entry, Tf, and
 * after Do (a Form XObject's Tf persists past the restore) */
static int refresh_font_style(Ctx *c)
{
    PyObject *fn = PyObject_GetAttr(c->st, a_font_name);
    if (!fn)
        return -1;
    Py_XDECREF(c->font_name);
    c->font_name = fn;
    c->fbold = 0;
    c->fital = 0;
    if (fn != Py_None) {
        PyObject *r = PyObject_CallOneArg(g_font_style, fn);
        if (!r)
            return -1;
        if (!PyTuple_Check(r) || PyTuple_GET_SIZE(r) != 2) {
            Py_DECREF(r);
            PyErr_SetString(PyExc_TypeError, "font style not a pair");
            return -1;
        }
        c->fbold = PyObject_IsTrue(PyTuple_GET_ITEM(r, 0));
        c->fital = PyObject_IsTrue(PyTuple_GET_ITEM(r, 1));
        Py_DECREF(r);
        if (c->fbold < 0 || c->fital < 0)
            return -1;
    }
    return 0;
}

/* Interpreter._emit_fragment transcription: empty/artifact gates, then
 * either the pending-ActualText absorb (delegated — it reads live state)
 * or a TextFragment appended to interp.fragments.  The caller guarantees
 * c->layout. */
static int emit_fragment(Ctx *c, PyObject *decoded, double width, double x,
                         double y)
{
    if (PyUnicode_GET_LENGTH(decoded) == 0)
        return 0;
    if (!c->noart)
        return 0;
    ensure_scales(c);
    double eff_w = width * c->xsc;
    double eff_s = c->fs * c->ysc;
    if (c->pending != Py_None) {
        /* absorb into the pending accumulator: state attrs are current
         * (write-through discipline), so the helper reads them itself */
        PyObject *m = PyObject_GetAttr(c->interp, a_pending_absorb);
        if (!m)
            return -1;
        PyObject *args[4];
        args[0] = PyFloat_FromDouble(x);
        args[1] = PyFloat_FromDouble(y);
        args[2] = PyFloat_FromDouble(eff_s);
        args[3] = PyFloat_FromDouble(eff_w);
        if (!args[0] || !args[1] || !args[2] || !args[3]) {
            Py_XDECREF(args[0]);
            Py_XDECREF(args[1]);
            Py_XDECREF(args[2]);
            Py_XDECREF(args[3]);
            Py_DECREF(m);
            return -1;
        }
        PyObject *r = PyObject_Vectorcall(m, args, 4, NULL);
        Py_DECREF(args[0]);
        Py_DECREF(args[1]);
        Py_DECREF(args[2]);
        Py_DECREF(args[3]);
        Py_DECREF(m);
        if (!r)
            return -1;
        Py_DECREF(r);
        return 0;
    }
    CFrag *frag = cfrag_alloc();
    if (!frag)
        return -1;
    Py_INCREF(decoded);
    Py_INCREF(c->font_name);
    Py_INCREF(c->fill_color);
    Py_INCREF(c->cur_mcid);
    Py_INCREF(c->cur_tag);
    frag->text = decoded;
    frag->font_name = c->font_name;
    frag->color = c->fill_color;
    frag->mcid = c->cur_mcid;
    frag->struct_tag = c->cur_tag;
    frag->x = x;
    frag->y = y;
    frag->width = eff_w;
    frag->height = eff_s;
    frag->font_size = eff_s;
    frag->is_bold = (char)c->fbold;
    frag->is_italic = (char)c->fital;
    int rc = PyList_Append(c->fragments, (PyObject *)frag);
    Py_DECREF(frag);
    return rc;
}

/* ---- show text (transcription of the inline tail, fast_show branch) ---- */
static int do_show(Ctx *c, const unsigned char *p, Py_ssize_t len,
                   PyObject *owned)
{
    PyObject *key;
    if (owned) {
        key = owned;
        Py_INCREF(key);
    } else {
        key = PyBytes_FromStringAndSize((const char *)p, len);
        if (!key)
            return -1;
    }
    PyObject *hit = PyDict_GetItemWithError(c->font_memo, key); /* borrowed */
    if (hit) {
        Py_INCREF(hit);
    } else {
        if (PyErr_Occurred()) {
            Py_DECREF(key);
            return -1;
        }
        hit = PyObject_CallOneArg(c->decode_meth, key);
        if (!hit) {
            Py_DECREF(key);
            return -1;
        }
    }
    Py_DECREF(key);
    if (!PyTuple_Check(hit) || PyTuple_GET_SIZE(hit) != 2) {
        Py_DECREF(hit);
        PyErr_SetString(PyExc_TypeError, "decode memo entry not a pair");
        return -1;
    }
    PyObject *decoded = PyTuple_GET_ITEM(hit, 0);
    double unit_w = PyFloat_AsDouble(PyTuple_GET_ITEM(hit, 1));
    if (unit_w == -1.0 && PyErr_Occurred()) {
        Py_DECREF(hit);
        return -1;
    }
    double x, y;
    if (c->ctm_ident && !c->layout) {
        /* fast-show only: x/y feed last_x/last_y additively, where the
         * -0.0-vs-+0.0 shortcut difference cannot surface */
        x = c->tt4;
        y = c->tt5;
    } else {
        x = c->tt4 * c->ctm[0] + c->tt5 * c->ctm[2] + c->ctm[4];
        y = c->tt4 * c->ctm[1] + c->tt5 * c->ctm[3] + c->ctm[5];
    }
    if (c->noart) {
        if (c->total) {
            double dy = y - c->lasty;
            if (dy > c->nl_thr || -dy > c->nl_thr) {
                if (PyList_Append(c->text_parts, g_nl) < 0) {
                    Py_DECREF(hit);
                    return -1;
                }
                c->total += 1;
                c->lastc = '\n';
            } else if (x - c->lastx > c->l_sp) {
                if (PyList_Append(c->text_parts, g_sp) < 0) {
                    Py_DECREF(hit);
                    return -1;
                }
                c->total += 1;
                c->lastc = ' ';
            }
        }
        Py_ssize_t dlen = PyUnicode_GET_LENGTH(decoded);
        if (dlen) {
            if (PyList_Append(c->text_parts, decoded) < 0) {
                Py_DECREF(hit);
                return -1;
            }
            c->total += dlen;
            c->lastc = PyUnicode_ReadChar(decoded, dlen - 1);
        }
    }
    double width = unit_w * c->fs;
    if (c->layout && emit_fragment(c, decoded, width, x, y) < 0) {
        Py_DECREF(hit);
        return -1;
    }
    c->lastx = x + width;
    c->lasty = y;
    double tx = (c->hs == 100.0) ? width : width * c->hs / 100.0;
    c->tt4 = tx * c->la1 + c->tt4;
    c->tt5 = tx * c->la2 + c->tt5;
    Py_DECREF(hit);
    return 0;
}

/* ---- _hexval parity ----------------------------------------------------- */
static int hex_digit(unsigned char ch)
{
    if (ch >= '0' && ch <= '9')
        return ch - '0';
    if (ch >= 'A' && ch <= 'F')
        return ch - 'A' + 10;
    if (ch >= 'a' && ch <= 'f')
        return ch - 'a' + 10;
    return -1;
}

/* decode the inner hex bytes [p, p+len) per _hexval; returns owned PyBytes
 * or NULL with the Python _hexval's exact exception (called for parity). */
static PyObject *hexval_c(Ctx *c, const unsigned char *p, Py_ssize_t len)
{
    char small[256];
    char *buf = len <= (Py_ssize_t)sizeof(small)
                    ? small
                    : (char *)malloc((size_t)len ? (size_t)len : 1);
    if (!buf)
        return PyErr_NoMemory();
    Py_ssize_t m = 0;
    int bad = 0;
    for (Py_ssize_t i = 0; i < len; i++) {
        unsigned char ch = p[i];
        if (ch == ' ' || ch == '\t' || ch == '\r' || ch == '\n' || ch == 0x0c)
            continue; /* _EOL_WS removal; NUL is NOT removed (parity) */
        if (hex_digit(ch) < 0)
            bad = 1;
        buf[m++] = (char)ch;
    }
    if (bad) {
        if (buf != small)
            free(buf);
        /* exact exception parity: raise through the Python _hexval */
        PyObject *arg =
            PyBytes_FromStringAndSize((const char *)p, len);
        if (!arg)
            return NULL;
        PyObject *r = PyObject_CallOneArg(g_hexval, arg);
        Py_DECREF(arg);
        return r; /* normally NULL with binascii.Error set */
    }
    PyObject *out = PyBytes_FromStringAndSize(NULL, (m + 1) / 2);
    if (!out) {
        if (buf != small)
            free(buf);
        return NULL;
    }
    unsigned char *o = (unsigned char *)PyBytes_AS_STRING(out);
    for (Py_ssize_t i = 0; i < m; i += 2) {
        int hi = hex_digit((unsigned char)buf[i]);
        int lo = (i + 1 < m) ? hex_digit((unsigned char)buf[i + 1]) : 0;
        o[i / 2] = (unsigned char)((hi << 4) | lo);
    }
    if (buf != small)
        free(buf);
    return out;
}

/* ---- literal string reader (parity with _read_literal_string) ----------- */
static PyObject *read_literal(Ctx *c, Py_ssize_t *pos)
{
    const unsigned char *d = c->data;
    Py_ssize_t n = c->n, i = *pos;
    Py_ssize_t cap = 64, m = 0;
    unsigned char *buf = (unsigned char *)malloc(cap);
    if (!buf)
        return PyErr_NoMemory();
    int depth = 1;
    while (i < n && depth > 0) {
        unsigned char ch = d[i++];
        unsigned char outc;
        if (ch == 0x5c) { /* backslash */
            if (i >= n)
                break;
            unsigned char e = d[i++];
            if (e == 'n')
                outc = 0x0a;
            else if (e == 'r')
                outc = 0x0d;
            else if (e == 't')
                outc = 0x09;
            else if (e == 'b')
                outc = 0x08;
            else if (e == 'f')
                outc = 0x0c;
            else if (e == '(' || e == ')' || e == 0x5c)
                outc = e;
            else if (e >= '0' && e <= '7') {
                int val = e - '0', cnt = 1;
                while (cnt < 3 && i < n && d[i] >= '0' && d[i] <= '7') {
                    val = val * 8 + (d[i] - '0');
                    i++;
                    cnt++;
                }
                outc = (unsigned char)(val & 0xff);
            } else
                outc = e;
        } else if (ch == '(') {
            depth++;
            outc = ch;
        } else if (ch == ')') {
            depth--;
            if (depth <= 0)
                break;
            outc = ch;
        } else
            outc = ch;
        if (m >= cap) {
            cap *= 2;
            unsigned char *nb = (unsigned char *)realloc(buf, cap);
            if (!nb) {
                free(buf);
                return PyErr_NoMemory();
            }
            buf = nb;
        }
        buf[m++] = outc;
    }
    *pos = i;
    PyObject *out = PyBytes_FromStringAndSize((const char *)buf, m);
    free(buf);
    return out;
}

/* ---- inline image data reader (parity with _read_inline_image_data) ---- */
static int is_eol_ws(unsigned char ch)
{
    return ch == ' ' || ch == '\t' || ch == '\r' || ch == '\n' || ch == 0x0c;
}

static PyObject *read_inline_data(Ctx *c, Py_ssize_t *pos)
{
    const unsigned char *d = c->data;
    Py_ssize_t n = c->n, p = *pos;
    if (p < n && (d[p] == ' ' || d[p] == '\n' || d[p] == '\r' || d[p] == '\t')) {
        unsigned char ch = d[p];
        p++;
        if (ch == 0x0d && p < n && d[p] == 0x0a)
            p++;
    }
    Py_ssize_t start = p, i = p;
    while (i + 1 < n) {
        int preceded = (i == start) || is_eol_ws(d[i - 1]);
        if (preceded && d[i] == 'E' && d[i + 1] == 'I') {
            Py_ssize_t after = i + 2;
            unsigned char na = after < n ? d[after] : ' ';
            if (after >= n || na == ' ' || na == '\t' || na == '\r' ||
                na == '\n' || na == 0x0c || na == '/' || na == '<' ||
                na == '(' || na == '[' || na == '%') {
                Py_ssize_t end = i;
                if (end > start && is_eol_ws(d[end - 1]))
                    end--;
                *pos = after;
                return PyBytes_FromStringAndSize((const char *)(d + start),
                                                 end - start);
            }
        }
        i++;
    }
    *pos = n;
    return PyBytes_FromStringAndSize((const char *)(d + start), n - start);
}

/* ---- name decode via _NAME_MEMO (keys include the leading '/') --------- */
static PyObject *decode_name_memo(const unsigned char *p, Py_ssize_t len)
{
    /* p/len = name WITHOUT the slash; memo key = b'/'+inner (the token
     * path's keyspace; the no-slash Tf keys coexist harmlessly) */
    PyObject *key = PyBytes_FromStringAndSize(NULL, len + 1);
    if (!key)
        return NULL;
    char *kb = PyBytes_AS_STRING(key);
    kb[0] = '/';
    memcpy(kb + 1, p, (size_t)len);
    PyObject *s = PyDict_GetItemWithError(g_name_memo, key);
    if (s) {
        Py_INCREF(s);
        Py_DECREF(key);
        return s;
    }
    if (PyErr_Occurred()) {
        Py_DECREF(key);
        return NULL;
    }
    if (PyDict_GET_SIZE(g_name_memo) > 8192)
        PyDict_Clear(g_name_memo);
    PyObject *inner = PyBytes_FromStringAndSize((const char *)p, len);
    if (!inner) {
        Py_DECREF(key);
        return NULL;
    }
    s = PyObject_CallOneArg(g_decode_name, inner);
    Py_DECREF(inner);
    if (!s) {
        Py_DECREF(key);
        return NULL;
    }
    if (PyDict_SetItem(g_name_memo, key, s) < 0) {
        Py_DECREF(key);
        Py_DECREF(s);
        return NULL;
    }
    Py_DECREF(key);
    return s;
}

/* ---- number scan (parity with _NUMPAT) ---------------------------------- */
/* returns token length (>0) or 0 if no number starts at p */
static Py_ssize_t scan_number(const unsigned char *p, Py_ssize_t avail,
                              int *is_int)
{
    Py_ssize_t i = 0;
    if (i < avail && (p[i] == '+' || p[i] == '-'))
        i++;
    Py_ssize_t ds = i;
    while (i < avail && p[i] >= '0' && p[i] <= '9')
        i++;
    if (i > ds) { /* \d+ then optional .\d* */
        if (i < avail && p[i] == '.') {
            i++;
            while (i < avail && p[i] >= '0' && p[i] <= '9')
                i++;
            *is_int = 0;
        } else
            *is_int = 1;
        return i;
    }
    if (i < avail && p[i] == '.') { /* \.\d+ */
        i++;
        Py_ssize_t fs = i;
        while (i < avail && p[i] >= '0' && p[i] <= '9')
            i++;
        if (i > fs) {
            *is_int = 0;
            return i;
        }
    }
    return 0;
}

static double parse_double(const unsigned char *p, Py_ssize_t len)
{
    char small[64];
    if (len < (Py_ssize_t)sizeof(small)) {
        memcpy(small, p, (size_t)len);
        small[len] = 0;
        return strtod(small, NULL);
    }
    char *buf = (char *)malloc((size_t)len + 1);
    if (!buf)
        return 0.0; /* overflow-length numbers: best effort */
    memcpy(buf, p, (size_t)len);
    buf[len] = 0;
    double v = strtod(buf, NULL);
    free(buf);
    return v;
}

/* materialize a Val into a fresh Python object (for helper calls) */
static PyObject *val_to_obj(Val *v)
{
    switch (v->tag) {
    case V_NUM:
        if (v->is_int) {
            if (v->ival_ok)
                return PyLong_FromLongLong(v->ival);
            /* huge integer literal: exact via PyLong_FromString */
            {
                char *buf = (char *)malloc((size_t)v->len + 1);
                if (!buf)
                    return PyErr_NoMemory();
                memcpy(buf, v->ptr, (size_t)v->len);
                buf[v->len] = 0;
                PyObject *r = PyLong_FromString(buf, NULL, 10);
                free(buf);
                return r;
            }
        }
        return PyFloat_FromDouble(v->num);
    case V_STR:
        if (v->obj) {
            Py_INCREF(v->obj);
            return v->obj;
        }
        return PyBytes_FromStringAndSize((const char *)v->ptr, v->len);
    case V_NAME:
    case V_MARK:
    case V_OBJ:
        Py_INCREF(v->obj);
        return v->obj;
    }
    PyErr_SetString(PyExc_RuntimeError, "bad val tag");
    return NULL;
}

/* pop top-k numbers as doubles (mirror of _vnums: NUM tags only) */
static int vnums(Ctx *c, int k, double *out)
{
    if (c->sp < k)
        return 0;
    for (int i = 0; i < k; i++) {
        Val *v = &c->stk[c->sp - k + i];
        if (v->tag != V_NUM)
            return 0;
        out[i] = v->num;
    }
    return 1;
}

/* ---- TJ array execution (mirror _rarray + _show_text_array fast path) -- */
static int exec_tj(Ctx *c)
{
    /* find the array span on the stack: from top, optional AC, then
     * elements (skipping stray ACs) down to an AO; all elements must be
     * STR or NUM else the op is skipped (Python: out=None). */
    Py_ssize_t i = c->sp - 1;
    if (i >= 0 && c->stk[i].tag == V_MARK && c->stk[i].obj == g_AC)
        i--;
    Py_ssize_t lo = -1;
    for (Py_ssize_t j = i; j >= 0; j--) {
        Val *v = &c->stk[j];
        if (v->tag == V_MARK) {
            if (v->obj == g_AO) {
                lo = j;
                break;
            }
            if (v->obj == g_AC)
                continue; /* stray close markers skipped */
            return 1; /* DO/DC marker → parse error → skip */
        }
        if (v->tag != V_STR && v->tag != V_NUM)
            return 1; /* invalid element → skip */
    }
    if (lo < 0)
        return 1; /* no opening marker → parse error → skip */
    if (!c->in_text)
        return 1;
    if (c->layout) {
        /* layout-path _show_text_array: per-element advance + origins +
         * fragments (textstate.py:585) */
        double fsize = c->fs;
        double thr = c->tj_thr * fsize;
        int skip_l = !c->noart;
        for (Py_ssize_t j = lo + 1; j <= i; j++) {
            Val *v = &c->stk[j];
            if (v->tag == V_MARK)
                continue;
            double tx;
            if (v->tag == V_STR) {
                PyObject *key;
                if (v->obj) {
                    key = v->obj;
                    Py_INCREF(key);
                } else {
                    key = PyBytes_FromStringAndSize((const char *)v->ptr,
                                                    v->len);
                    if (!key)
                        return -1;
                }
                PyObject *hit = PyDict_GetItemWithError(c->font_memo, key);
                if (hit) {
                    Py_INCREF(hit);
                } else {
                    if (PyErr_Occurred()) {
                        Py_DECREF(key);
                        return -1;
                    }
                    hit = PyObject_CallOneArg(c->decode_meth, key);
                    if (!hit) {
                        Py_DECREF(key);
                        return -1;
                    }
                }
                Py_DECREF(key);
                PyObject *decoded = PyTuple_GET_ITEM(hit, 0);
                double unit_w = PyFloat_AsDouble(PyTuple_GET_ITEM(hit, 1));
                if (unit_w == -1.0 && PyErr_Occurred()) {
                    Py_DECREF(hit);
                    return -1;
                }
                Py_ssize_t dlen = PyUnicode_GET_LENGTH(decoded);
                if (!skip_l && dlen) {
                    if (PyList_Append(c->text_parts, decoded) < 0) {
                        Py_DECREF(hit);
                        return -1;
                    }
                    c->total += dlen;
                    c->lastc = PyUnicode_ReadChar(decoded, dlen - 1);
                }
                double width = unit_w * fsize;
                double fx, fy;
                origin_xy(c, &fx, &fy);
                if (emit_fragment(c, decoded, width, fx, fy) < 0) {
                    Py_DECREF(hit);
                    return -1;
                }
                tx = width * c->hs / 100.0;
                Py_DECREF(hit);
            } else { /* number */
                tx = -v->num / 1000.0 * fsize;
                if (!skip_l && tx > thr && c->total && c->lastc != ' ') {
                    if (PyList_Append(c->text_parts, g_sp) < 0)
                        return -1;
                    c->total += 1;
                    c->lastc = ' ';
                    if (c->pending == Py_None) {
                        double sx, sy;
                        origin_xy(c, &sx, &sy);
                        if (emit_fragment(c, g_sp, tx, sx, sy) < 0)
                            return -1;
                    }
                }
            }
            c->tt4 = tx * c->la1 + c->tt4;
            c->tt5 = tx * c->la2 + c->tt5;
        }
        return 1;
    }
    /* fast-path _show_text_array over elements lo+1..i (textstate.py:551) */
    int skip = !c->noart;
    double fsize = c->fs;
    double hs = c->hs / 100.0;
    double thr = c->tj_thr * fsize;
    double tx_total = 0.0;
    for (Py_ssize_t j = lo + 1; j <= i; j++) {
        Val *v = &c->stk[j];
        if (v->tag == V_MARK)
            continue; /* stray AC inside span */
        if (v->tag == V_STR) {
            PyObject *key;
            if (v->obj) {
                key = v->obj;
                Py_INCREF(key);
            } else {
                key = PyBytes_FromStringAndSize((const char *)v->ptr, v->len);
                if (!key)
                    return -1;
            }
            PyObject *hit = PyDict_GetItemWithError(c->font_memo, key);
            if (hit) {
                Py_INCREF(hit);
            } else {
                if (PyErr_Occurred()) {
                    Py_DECREF(key);
                    return -1;
                }
                hit = PyObject_CallOneArg(c->decode_meth, key);
                if (!hit) {
                    Py_DECREF(key);
                    return -1;
                }
            }
            Py_DECREF(key);
            PyObject *decoded = PyTuple_GET_ITEM(hit, 0);
            double unit_w = PyFloat_AsDouble(PyTuple_GET_ITEM(hit, 1));
            if (unit_w == -1.0 && PyErr_Occurred()) {
                Py_DECREF(hit);
                return -1;
            }
            Py_ssize_t dlen = PyUnicode_GET_LENGTH(decoded);
            if (!skip && dlen) {
                if (PyList_Append(c->text_parts, decoded) < 0) {
                    Py_DECREF(hit);
                    return -1;
                }
                c->total += dlen;
                c->lastc = PyUnicode_ReadChar(decoded, dlen - 1);
            }
            tx_total += unit_w * fsize * hs;
            Py_DECREF(hit);
        } else { /* number */
            double tx = -v->num / 1000.0 * fsize;
            if (!skip && tx > thr && c->total && c->lastc != ' ') {
                if (PyList_Append(c->text_parts, g_sp) < 0)
                    return -1;
                c->total += 1;
                c->lastc = ' ';
            }
            tx_total += tx;
        }
    }
    c->tt4 = tx_total * c->la1 + c->tt4;
    c->tt5 = tx_total * c->la2 + c->tt5;
    return 1;
}

/* ---- macro-shape lookaheads ---------------------------------------------
 * The Python loop's fused alternatives (M1/M2/B0 string-show, M5 flat-TJ)
 * defer string decoding behind the in_text gate, while the generic token
 * path decodes hex strings EAGERLY at push (raising on bad digits even
 * outside a text block).  The C scanner must make the same alternative
 * choice the regex makes, or error behavior diverges on bad hex:
 *   <bad> Tj          → M2: no decode outside text, raise inside
 *   [ <bad> ] TJ      → M5 (flat body): same gate
 *   [ <bad> /X ] TJ   → generic (body not flat): eager raise at push
 *   <bad>             → generic: eager raise
 */
static int is_ws1(unsigned char ch)
{
    return ch == 0 || ch == '\t' || ch == '\n' || ch == 0x0c ||
           ch == '\r' || ch == ' ';
}

static int is_bound(unsigned char ch)
{
    return is_ws1(ch) || ch == '(' || ch == ')' || ch == '<' || ch == '>' ||
           ch == '[' || ch == ']' || ch == '{' || ch == '}' || ch == '/' ||
           ch == '%' || ch == ';';
}

/* from k: _WS1* then 'Tj' then _BOUND; returns pos after 'Tj' or -1 */
static Py_ssize_t tj_lookahead(const unsigned char *d, Py_ssize_t n,
                               Py_ssize_t k)
{
    while (k < n && is_ws1(d[k]))
        k++;
    if (k + 1 < n && d[k] == 'T' && d[k + 1] == 'j' &&
        (k + 2 >= n || is_bound(d[k + 2])))
        return k + 2;
    return -1;
}

typedef struct {
    unsigned char is_num;
    unsigned char is_hex;
    double num;
    const unsigned char *ptr;
    Py_ssize_t len;
} TjEl;

/* M5 flat-TJ body match from `k` (just after '['); fills els (malloc'd,
 * caller frees), sets *endpos past 'TJ'. Returns count >= 0 on match,
 * -1 when the body is not flat (caller falls back to the generic AO
 * token), -2 on malloc failure. */
static Py_ssize_t flat_tj_scan(const unsigned char *d, Py_ssize_t n,
                               Py_ssize_t k, TjEl **els_out,
                               Py_ssize_t *endpos)
{
    Py_ssize_t cap = 16, cnt = 0;
    TjEl *els = (TjEl *)malloc(cap * sizeof(TjEl));
    if (!els)
        return -2;
    for (;;) {
        while (k < n && is_ws1(d[k]))
            k++;
        if (k >= n)
            goto nomatch;
        unsigned char ch = d[k];
        if (ch == ']') {
            k++;
            break;
        }
        TjEl el;
        memset(&el, 0, sizeof(el));
        if ((ch >= '0' && ch <= '9') || ch == '+' || ch == '-' || ch == '.') {
            int is_int = 0;
            Py_ssize_t tl = scan_number(d + k, n - k, &is_int);
            if (tl <= 0)
                goto nomatch;
            el.is_num = 1;
            el.num = parse_double(d + k, tl);
            k += tl;
        } else if (ch == '(') {
            Py_ssize_t j = k + 1;
            while (j < n && d[j] != '(' && d[j] != ')' && d[j] != 0x5c)
                j++;
            if (j >= n || d[j] != ')')
                goto nomatch;
            el.ptr = d + k + 1;
            el.len = j - k - 1;
            k = j + 1;
        } else if (ch == '<') {
            Py_ssize_t j = k + 1;
            while (j < n) {
                unsigned char x = d[j];
                if ((x >= '0' && x <= '9') || (x >= 'A' && x <= 'F') ||
                    (x >= 'a' && x <= 'f') || is_ws1(x))
                    j++;
                else
                    break;
            }
            if (j >= n || d[j] != '>')
                goto nomatch;
            el.is_hex = 1;
            el.ptr = d + k + 1;
            el.len = j - k - 1;
            k = j + 1;
        } else
            goto nomatch;
        if (cnt >= cap) {
            cap *= 2;
            TjEl *ne = (TjEl *)realloc(els, cap * sizeof(TjEl));
            if (!ne) {
                free(els);
                return -2;
            }
            els = ne;
        }
        els[cnt++] = el;
    }
    while (k < n && is_ws1(d[k]))
        k++;
    if (!(k + 1 < n && d[k] == 'T' && d[k + 1] == 'J' &&
          (k + 2 >= n || is_bound(d[k + 2]))))
        goto nomatch;
    *els_out = els;
    *endpos = k + 2;
    return cnt;
nomatch:
    free(els);
    return -1;
}

/* execute a flat TJ (mirror of the M5 branch: _tj_elements decodes ALL
 * strings first — a bad hex raises before any state change — then
 * _show_text_array's fast path runs). Caller checked in_text. */
static int flat_tj_show(Ctx *c, TjEl *els, Py_ssize_t cnt)
{
    /* pass 1: materialize string bytes (the _tj_elements pass) */
    PyObject **keys = NULL;
    if (cnt) {
        keys = (PyObject **)calloc((size_t)cnt, sizeof(PyObject *));
        if (!keys) {
            PyErr_NoMemory();
            return -1;
        }
    }
    for (Py_ssize_t i = 0; i < cnt; i++) {
        if (els[i].is_num)
            continue;
        PyObject *k = els[i].is_hex
                          ? hexval_c(c, els[i].ptr, els[i].len)
                          : PyBytes_FromStringAndSize((const char *)els[i].ptr,
                                                      els[i].len);
        if (!k) {
            for (Py_ssize_t j2 = 0; j2 < i; j2++)
                Py_XDECREF(keys[j2]);
            free(keys);
            return -1;
        }
        keys[i] = k;
    }
    int skip = !c->noart;
    double fsize = c->fs;
    double hs = c->hs / 100.0;
    double thr = c->tj_thr * fsize;
    double tx_total = 0.0;
    int rc = -1;
    if (c->layout) {
        /* pass 2 (layout): per-element advance + origins + fragments
         * (textstate.py:585) */
        for (Py_ssize_t i = 0; i < cnt; i++) {
            double tx;
            if (els[i].is_num) {
                tx = -els[i].num / 1000.0 * fsize;
                if (!skip && tx > thr && c->total && c->lastc != ' ') {
                    if (PyList_Append(c->text_parts, g_sp) < 0)
                        goto done;
                    c->total += 1;
                    c->lastc = ' ';
                    if (c->pending == Py_None) {
                        double sx, sy;
                        origin_xy(c, &sx, &sy);
                        if (emit_fragment(c, g_sp, tx, sx, sy) < 0)
                            goto done;
                    }
                }
            } else {
                PyObject *hit = PyDict_GetItemWithError(c->font_memo, keys[i]);
                if (hit) {
                    Py_INCREF(hit);
                } else {
                    if (PyErr_Occurred())
                        goto done;
                    hit = PyObject_CallOneArg(c->decode_meth, keys[i]);
                    if (!hit)
                        goto done;
                }
                PyObject *decoded = PyTuple_GET_ITEM(hit, 0);
                double unit_w = PyFloat_AsDouble(PyTuple_GET_ITEM(hit, 1));
                if (unit_w == -1.0 && PyErr_Occurred()) {
                    Py_DECREF(hit);
                    goto done;
                }
                Py_ssize_t dlen = PyUnicode_GET_LENGTH(decoded);
                if (!skip && dlen) {
                    if (PyList_Append(c->text_parts, decoded) < 0) {
                        Py_DECREF(hit);
                        goto done;
                    }
                    c->total += dlen;
                    c->lastc = PyUnicode_ReadChar(decoded, dlen - 1);
                }
                double width = unit_w * fsize;
                double fx, fy;
                origin_xy(c, &fx, &fy);
                if (emit_fragment(c, decoded, width, fx, fy) < 0) {
                    Py_DECREF(hit);
                    goto done;
                }
                tx = width * c->hs / 100.0;
                Py_DECREF(hit);
            }
            c->tt4 = tx * c->la1 + c->tt4;
            c->tt5 = tx * c->la2 + c->tt5;
        }
        rc = 0;
        goto done;
    }
    /* pass 2: the _show_text_array fast path */
    for (Py_ssize_t i = 0; i < cnt; i++) {
        if (els[i].is_num) {
            double tx = -els[i].num / 1000.0 * fsize;
            if (!skip && tx > thr && c->total && c->lastc != ' ') {
                if (PyList_Append(c->text_parts, g_sp) < 0)
                    goto done;
                c->total += 1;
                c->lastc = ' ';
            }
            tx_total += tx;
            continue;
        }
        PyObject *hit = PyDict_GetItemWithError(c->font_memo, keys[i]);
        if (hit) {
            Py_INCREF(hit);
        } else {
            if (PyErr_Occurred())
                goto done;
            hit = PyObject_CallOneArg(c->decode_meth, keys[i]);
            if (!hit)
                goto done;
        }
        PyObject *decoded = PyTuple_GET_ITEM(hit, 0);
        double unit_w = PyFloat_AsDouble(PyTuple_GET_ITEM(hit, 1));
        if (unit_w == -1.0 && PyErr_Occurred()) {
            Py_DECREF(hit);
            goto done;
        }
        Py_ssize_t dlen = PyUnicode_GET_LENGTH(decoded);
        if (!skip && dlen) {
            if (PyList_Append(c->text_parts, decoded) < 0) {
                Py_DECREF(hit);
                goto done;
            }
            c->total += dlen;
            c->lastc = PyUnicode_ReadChar(decoded, dlen - 1);
        }
        tx_total += unit_w * fsize * hs;
        Py_DECREF(hit);
    }
    c->tt4 = tx_total * c->la1 + c->tt4;
    c->tt5 = tx_total * c->la2 + c->tt5;
    rc = 0;
done:
    for (Py_ssize_t i = 0; i < cnt; i++)
        Py_XDECREF(keys[i]);
    free(keys);
    return rc;
}

/* call a 1-arg interp method by attr name, discard result */
static int call_method1(Ctx *c, PyObject *meth_name, PyObject *arg)
{
    PyObject *m = PyObject_GetAttr(c->interp, meth_name);
    if (!m)
        return -1;
    PyObject *r = PyObject_CallOneArg(m, arg);
    Py_DECREF(m);
    if (!r)
        return -1;
    Py_DECREF(r);
    return 0;
}

static int refresh_font_memo(Ctx *c)
{
    PyObject *fm = PyObject_GetAttr(c->interp, a_font_memo);
    if (!fm)
        return -1;
    Py_DECREF(c->font_memo);
    c->font_memo = fm;
    return 0;
}

/* after Do: the full re-read block (content.py Do branch) */
static int resync_after_do(Ctx *c)
{
    if (resync_in(c) < 0)
        return -1;
    if (refresh_font_memo(c) < 0)
        return -1;
    PyObject *it = PyObject_GetAttr(c->interp, a_in_text);
    if (!it)
        return -1;
    c->in_text = PyObject_IsTrue(it);
    Py_DECREF(it);
    if (c->in_text < 0)
        return -1;
    if (read_mat6(c->st, a_ctm, c->ctm) < 0)
        return -1;
    update_ctm_ident(c);
    if (get_f(c->st, a_font_size, &c->fs) < 0)
        return -1;
    c->l_sp = c->sp_thr * c->fs;
    if (get_f(c->st, a_horizontal_scale, &c->hs) < 0)
        return -1;
    if (read_noart(c) < 0)
        return -1;
    /* fill_color / saved may have been restored */
    PyObject *fc = PyObject_GetAttr(c->st, a_fill_color);
    if (!fc)
        return -1;
    Py_DECREF(c->fill_color);
    c->fill_color = fc;
    {
        /* a Tf inside the XObject persists past the restore */
        PyObject *fn = PyObject_GetAttr(c->st, a_font_name);
        if (!fn)
            return -1;
        Py_XDECREF(c->tf_name);
        c->tf_name = fn;
    }
    if (c->layout) {
        /* a Form XObject's Tf persists past the restore; mc stack /
         * pending may have moved inside nested streams; CTM restored */
        if (refresh_font_style(c) < 0)
            return -1;
        if (refresh_frag_env(c) < 0)
            return -1;
        c->scale_dirty = 1;
    }
    return 0;
}

/* ======================================================================== */
static PyObject *run_page(PyObject *self, PyObject *args)
{
    Ctx cx;
    Ctx *c = &cx;
    memset(c, 0, sizeof(Ctx));
    int depth;
    if (!PyArg_ParseTuple(args, "OOOi", &c->interp, &c->data_obj,
                          &c->resources, &depth))
        return NULL;
    c->depth = depth;
    if (!PyBytes_Check(c->data_obj)) {
        PyErr_SetString(PyExc_TypeError, "data must be bytes");
        return NULL;
    }
    c->data = (const unsigned char *)PyBytes_AS_STRING(c->data_obj);
    c->n = PyBytes_GET_SIZE(c->data_obj);

    /* ---- entry state read (mirror of the Python loop prologue) ---- */
    c->st = PyObject_GetAttr(c->interp, a_state);
    if (!c->st)
        return NULL;
    c->opts = PyObject_GetAttr(c->interp, a_options);
    if (!c->opts)
        goto fail_early;
    if (get_f(c->opts, a_newline_threshold, &c->nl_thr) < 0)
        goto fail_early;
    if (get_f(c->opts, a_space_threshold, &c->sp_thr) < 0)
        goto fail_early;
    if (get_f(c->opts, a_tj_space_threshold, &c->tj_thr) < 0)
        goto fail_early;
    {
        PyObject *ia = PyObject_GetAttr(c->opts, a_include_artifacts);
        if (!ia)
            goto fail_early;
        c->inc_art = PyObject_IsTrue(ia);
        Py_DECREF(ia);
        if (c->inc_art < 0)
            goto fail_early;
    }
    {
        PyObject *it = PyObject_GetAttr(c->interp, a_in_text);
        if (!it)
            goto fail_early;
        c->in_text = PyObject_IsTrue(it);
        Py_DECREF(it);
        if (c->in_text < 0)
            goto fail_early;
        PyObject *t = PyObject_GetAttr(c->interp, a_total);
        if (!t)
            goto fail_early;
        c->total = PyLong_AsLongLong(t);
        Py_DECREF(t);
        if (c->total == -1 && PyErr_Occurred())
            goto fail_early;
        if (get_f(c->interp, a_last_x, &c->lastx) < 0)
            goto fail_early;
        if (get_f(c->interp, a_last_y, &c->lasty) < 0)
            goto fail_early;
        if (read_lastc(c) < 0)
            goto fail_early;
    }
    c->text_parts = PyObject_GetAttr(c->interp, a_text_parts);
    if (!c->text_parts || !PyList_Check(c->text_parts))
        goto fail_early;
    c->font_memo = PyObject_GetAttr(c->interp, a_font_memo);
    if (!c->font_memo)
        goto fail_early;
    c->decode_meth = PyObject_GetAttr(c->interp, a_decode);
    if (!c->decode_meth)
        goto fail_early;
    c->saved = PyObject_GetAttr(c->st, a_saved);
    if (!c->saved || !PyList_Check(c->saved))
        goto fail_early;
    c->fill_color = PyObject_GetAttr(c->st, a_fill_color);
    if (!c->fill_color)
        goto fail_early;
    c->tf_name = PyObject_GetAttr(c->st, a_font_name);
    if (!c->tf_name)
        goto fail_early;
    {
        double m[6];
        if (read_mat6(c->st, a_text_line_matrix, m) < 0)
            goto fail_early;
        c->la1 = m[0];
        c->la2 = m[1];
        c->la3 = m[2];
        c->la4 = m[3];
        c->lt4 = m[4];
        c->lt5 = m[5];
        if (read_mat6(c->st, a_text_matrix, m) < 0)
            goto fail_early;
        c->tt4 = m[4];
        c->tt5 = m[5];
    }
    if (read_mat6(c->st, a_ctm, c->ctm) < 0)
        goto fail_early;
    update_ctm_ident(c);
    if (get_f(c->st, a_font_size, &c->fs) < 0)
        goto fail_early;
    if (get_f(c->st, a_horizontal_scale, &c->hs) < 0)
        goto fail_early;
    c->l_sp = c->sp_thr * c->fs;
    if (read_noart(c) < 0)
        goto fail_early;
    {
        /* layout stage: active only when the interpreter wants fragments
         * AND setup_layout installed the helpers */
        PyObject *lo = PyObject_GetAttr(c->interp, a_layout);
        if (!lo)
            goto fail_early;
        c->layout = PyObject_IsTrue(lo);
        Py_DECREF(lo);
        if (c->layout < 0)
            goto fail_early;
        if (c->layout && !g_frag_cls) {
            PyErr_SetString(PyExc_RuntimeError,
                            "layout mode requires setup_layout");
            goto fail_early;
        }
        if (c->layout) {
            c->fragments = PyObject_GetAttr(c->interp, a_fragments);
            if (!c->fragments)
                goto fail_early;
            if (!PyList_Check(c->fragments)) {
                PyErr_SetString(PyExc_TypeError,
                                "interp.fragments is not a list");
                goto fail_early;
            }
            if (refresh_font_style(c) < 0)
                goto fail_early;
            if (refresh_frag_env(c) < 0)
                goto fail_early;
            c->scale_dirty = 1;
        }
    }

    /* ---- the scan loop ---- */
    {
        const unsigned char *d = c->data;
        Py_ssize_t n = c->n;
        Py_ssize_t pos = 0;
        while (pos < n) {
            /* skippable prefix: whitespace runs + comments */
            unsigned char ch = d[pos];
            if (ch == 0 || ch == '\t' || ch == '\n' || ch == 0x0c ||
                ch == '\r' || ch == ' ') {
                pos++;
                continue;
            }
            if (ch == '%') {
                pos++;
                while (pos < n && d[pos] != '\r' && d[pos] != '\n')
                    pos++;
                continue;
            }
            /* token classification (generic _MASTER_FAST classes) */
            if (ch == '(') {
                /* flat string or full literal scan */
                Py_ssize_t j = pos + 1;
                while (j < n && d[j] != '(' && d[j] != ')' && d[j] != 0x5c)
                    j++;
                if (j < n && d[j] == ')') {
                    Py_ssize_t after = tj_lookahead(d, n, j + 1);
                    if (after >= 0) {
                        /* M2/M1/B0 show shape: (flat) Tj */
                        stack_clear(c);
                        if (c->in_text) {
                            if (do_show(c, d + pos + 1, j - pos - 1, NULL) < 0)
                                goto fail;
                        }
                        pos = after;
                        continue;
                    }
                    Val v = {V_STR, 0, 0, 0.0, 0, d + pos + 1, j - pos - 1,
                             NULL};
                    if (stack_push(c, v) < 0)
                        goto fail;
                    pos = j + 1;
                } else {
                    Py_ssize_t np = pos + 1;
                    PyObject *sb = read_literal(c, &np);
                    if (!sb)
                        goto fail;
                    Val v = {V_STR, 0, 0, 0.0, 0,
                             (const unsigned char *)PyBytes_AS_STRING(sb),
                             PyBytes_GET_SIZE(sb), sb};
                    if (stack_push(c, v) < 0)
                        goto fail;
                    pos = np;
                }
                continue;
            }
            if ((ch >= '0' && ch <= '9') || ch == '+' || ch == '-' ||
                ch == '.') {
                int is_int = 0;
                Py_ssize_t tl = scan_number(d + pos, n - pos, &is_int);
                if (tl > 0) {
                    Val v;
                    v.tag = V_NUM;
                    v.is_int = (unsigned char)is_int;
                    v.ptr = d + pos;
                    v.len = tl;
                    v.obj = NULL;
                    v.num = parse_double(d + pos, tl);
                    v.ival_ok = 0;
                    v.ival = 0;
                    if (is_int && tl <= 18) {
                        long long iv = 0;
                        Py_ssize_t k = 0;
                        int neg = 0;
                        if (d[pos] == '+' || d[pos] == '-') {
                            neg = d[pos] == '-';
                            k = 1;
                        }
                        for (; k < tl; k++)
                            iv = iv * 10 + (d[pos + k] - '0');
                        v.ival = neg ? -iv : iv;
                        v.ival_ok = 1;
                    }
                    if (stack_push(c, v) < 0)
                        goto fail;
                    pos += tl;
                    continue;
                }
                /* fall through: +/-/. alone start an op token */
            }
            if (ch == '/') {
                Py_ssize_t j = pos + 1;
                while (j < n) {
                    unsigned char x = d[j];
                    if (x == 0 || x == '\t' || x == '\n' || x == 0x0c ||
                        x == '\r' || x == ' ' || x == '(' || x == ')' ||
                        x == '<' || x == '>' || x == '[' || x == ']' ||
                        x == '{' || x == '}' || x == '/' || x == '%')
                        break;
                    j++;
                }
                PyObject *s = decode_name_memo(d + pos + 1, j - pos - 1);
                if (!s)
                    goto fail;
                Val v = {V_NAME, 0, 0, 0.0, 0, NULL, 0, s};
                if (stack_push(c, v) < 0)
                    goto fail;
                pos = j;
                continue;
            }
            if (ch == '<') {
                if (pos + 1 < n && d[pos + 1] == '<') {
                    Val v = {V_MARK, 0, 0, 0.0, 0, NULL, 0, g_DO};
                    Py_INCREF(g_DO);
                    if (stack_push(c, v) < 0)
                        goto fail;
                    pos += 2;
                    continue;
                }
                Py_ssize_t j = pos + 1;
                while (j < n) {
                    unsigned char x = d[j];
                    if ((x >= '0' && x <= '9') || (x >= 'A' && x <= 'F') ||
                        (x >= 'a' && x <= 'f') || x == 0 || x == '\t' ||
                        x == '\n' || x == 0x0c || x == '\r' || x == ' ')
                        j++;
                    else
                        break;
                }
                if (j < n && d[j] == '>') {
                    Py_ssize_t after = tj_lookahead(d, n, j + 1);
                    if (after >= 0) {
                        /* M2/M1/B0 show shape: <hex> Tj — decode only
                         * behind the in_text gate (macro semantics) */
                        stack_clear(c);
                        if (c->in_text) {
                            PyObject *hb =
                                hexval_c(c, d + pos + 1, j - pos - 1);
                            if (!hb)
                                goto fail;
                            int r = do_show(c, NULL, 0, hb);
                            Py_DECREF(hb);
                            if (r < 0)
                                goto fail;
                        }
                        pos = after;
                        continue;
                    }
                    PyObject *hb = hexval_c(c, d + pos + 1, j - pos - 1);
                    if (!hb)
                        goto fail;
                    Val v = {V_STR, 0, 0, 0.0, 0,
                             (const unsigned char *)PyBytes_AS_STRING(hb),
                             PyBytes_GET_SIZE(hb), hb};
                    if (stack_push(c, v) < 0)
                        goto fail;
                    pos = j + 1;
                } else {
                    pos++; /* unmatched '<': finditer skips one byte */
                }
                continue;
            }
            if (ch == '>') {
                if (pos + 1 < n && d[pos + 1] == '>') {
                    Val v = {V_MARK, 0, 0, 0.0, 0, NULL, 0, g_DC};
                    Py_INCREF(g_DC);
                    if (stack_push(c, v) < 0)
                        goto fail;
                    pos += 2;
                } else
                    pos++; /* lone '>' unmatched */
                continue;
            }
            if (ch == '[') {
                TjEl *els = NULL;
                Py_ssize_t endpos = 0;
                Py_ssize_t cnt = flat_tj_scan(d, n, pos + 1, &els, &endpos);
                if (cnt == -2) {
                    PyErr_NoMemory();
                    goto fail;
                }
                if (cnt >= 0) {
                    /* M5 flat-TJ shape: [ ... ] TJ */
                    stack_clear(c);
                    int r = 0;
                    if (c->in_text)
                        r = flat_tj_show(c, els, cnt);
                    free(els);
                    if (r < 0)
                        goto fail;
                    pos = endpos;
                    continue;
                }
                Val v = {V_MARK, 0, 0, 0.0, 0, NULL, 0, g_AO};
                Py_INCREF(g_AO);
                if (stack_push(c, v) < 0)
                    goto fail;
                pos++;
                continue;
            }
            if (ch == ']') {
                Val v = {V_MARK, 0, 0, 0.0, 0, NULL, 0, g_AC};
                Py_INCREF(g_AC);
                if (stack_push(c, v) < 0)
                    goto fail;
                pos++;
                continue;
            }
            if (ch == ';' || ch == ')' || ch == '{' || ch == '}') {
                pos++; /* skipd: dropped */
                continue;
            }
            /* operator token: [^ws ( ) < > [ ] { } / % ;]+ */
            {
                Py_ssize_t j = pos;
                while (j < n) {
                    unsigned char x = d[j];
                    if (x == 0 || x == '\t' || x == '\n' || x == 0x0c ||
                        x == '\r' || x == ' ' || x == '(' || x == ')' ||
                        x == '<' || x == '>' || x == '[' || x == ']' ||
                        x == '{' || x == '}' || x == '/' || x == '%' ||
                        x == ';')
                        break;
                    j++;
                }
                const unsigned char *op = d + pos;
                Py_ssize_t ol = j - pos;
                pos = j;
                /* pending show bytes (consumed after the stack clear) */
                const unsigned char *tbp = NULL;
                Py_ssize_t tbl = 0;
                PyObject *tbo = NULL;

                if (ol == 2 && op[0] == 'T' && op[1] == 'j') {
                    if (c->sp > 0 && c->stk[c->sp - 1].tag == V_STR &&
                        c->in_text) {
                        Val *v = &c->stk[c->sp - 1];
                        tbp = v->ptr;
                        tbl = v->len;
                        tbo = v->obj;
                        Py_XINCREF(tbo);
                    }
                } else if (ol == 2 && op[0] == 'T' && op[1] == 'd') {
                    double xy[2];
                    if (vnums(c, 2, xy)) {
                        c->lt4 = xy[0] * c->la1 + xy[1] * c->la3 + c->lt4;
                        c->lt5 = xy[0] * c->la2 + xy[1] * c->la4 + c->lt5;
                        c->tt4 = c->lt4;
                        c->tt5 = c->lt5;
                    }
                } else if (ol == 2 && op[0] == 'T' && op[1] == 'm') {
                    double v6[6];
                    if (vnums(c, 6, v6)) {
                        c->la1 = v6[0];
                        c->la2 = v6[1];
                        c->la3 = v6[2];
                        c->la4 = v6[3];
                        c->lt4 = v6[4];
                        c->lt5 = v6[5];
                        c->tt4 = c->lt4;
                        c->tt5 = c->lt5;
                        c->scale_dirty = 1;
                    }
                } else if (ol == 2 && op[0] == 'T' && op[1] == 'f') {
                    if (c->sp >= 2 && c->stk[c->sp - 2].tag == V_NAME &&
                        c->stk[c->sp - 1].tag == V_NUM) {
                        PyObject *s = c->stk[c->sp - 2].obj;
                        double sz = c->stk[c->sp - 1].num;
                        if (s == c->tf_name && sz == c->fs) {
                            /* same memoized name object, same size:
                             * every effect (attrs, memo, l_sp, style)
                             * is already in place — skip the Python
                             * round-trip */
                        } else {
                        if (PyObject_SetAttr(c->st, a_font_name, s) < 0)
                            goto fail;
                        if (set_f(c->st, a_font_size, sz) < 0)
                            goto fail;
                        c->fs = sz;
                        c->l_sp = c->sp_thr * c->fs;
                        Py_INCREF(s);
                        Py_XDECREF(c->tf_name);
                        c->tf_name = s;
                        if (call_method1(c, a_set_font_memo, s) < 0)
                            goto fail;
                        if (refresh_font_memo(c) < 0)
                            goto fail;
                        if (c->layout && refresh_font_style(c) < 0)
                            goto fail;
                        }
                    }
                } else if (ol == 2 && op[0] == 'B' && op[1] == 'T') {
                    c->in_text = 1;
                    c->la1 = 1.0;
                    c->la2 = 0.0;
                    c->la3 = 0.0;
                    c->la4 = 1.0;
                    c->lt4 = c->lt5 = c->tt4 = c->tt5 = 0.0;
                    c->scale_dirty = 1;
                } else if (ol == 2 && op[0] == 'E' && op[1] == 'T') {
                    c->in_text = 0;
                } else if (ol == 2 && op[0] == 'T' && op[1] == 'J') {
                    if (exec_tj(c) < 0)
                        goto fail;
                } else if (ol == 2 && op[0] == 'T' && op[1] == '*') {
                    double lead;
                    if (get_f(c->st, a_leading, &lead) < 0)
                        goto fail;
                    c->lt4 = -lead * c->la3 + c->lt4;
                    c->lt5 = -lead * c->la4 + c->lt5;
                    c->tt4 = c->lt4;
                    c->tt5 = c->lt5;
                } else if (ol == 1 && (op[0] == '\'' || op[0] == '"')) {
                    int ok;
                    if (op[0] == '\'')
                        ok = c->sp > 0 && c->stk[c->sp - 1].tag == V_STR;
                    else
                        ok = c->sp >= 3 &&
                             c->stk[c->sp - 1].tag == V_STR &&
                             c->stk[c->sp - 2].tag == V_NUM &&
                             c->stk[c->sp - 3].tag == V_NUM;
                    if (ok && c->in_text) {
                        if (op[0] == '"') {
                            if (set_f(c->st, a_word_space,
                                      c->stk[c->sp - 3].num) < 0)
                                goto fail;
                            if (set_f(c->st, a_char_space,
                                      c->stk[c->sp - 2].num) < 0)
                                goto fail;
                        }
                        Val *v = &c->stk[c->sp - 1];
                        PyObject *sb = val_to_obj(v);
                        if (!sb)
                            goto fail;
                        if (sync_out(c) < 0) {
                            Py_DECREF(sb);
                            goto fail;
                        }
                        int r = call_method1(c, a_next_line_show, sb);
                        Py_DECREF(sb);
                        if (r < 0)
                            goto fail;
                        if (resync_in(c) < 0)
                            goto fail;
                    }
                } else if (ol == 2 && op[0] == 'T' && op[1] == 'L') {
                    double v1[1];
                    if (vnums(c, 1, v1)) {
                        if (set_f(c->st, a_leading, v1[0]) < 0)
                            goto fail;
                    }
                } else if (ol == 2 && op[0] == 'T' && op[1] == 'c') {
                    double v1[1];
                    if (vnums(c, 1, v1)) {
                        if (set_f(c->st, a_char_space, v1[0]) < 0)
                            goto fail;
                    }
                } else if (ol == 2 && op[0] == 'T' && op[1] == 'w') {
                    double v1[1];
                    if (vnums(c, 1, v1)) {
                        if (set_f(c->st, a_word_space, v1[0]) < 0)
                            goto fail;
                    }
                } else if (ol == 2 && op[0] == 'T' && op[1] == 'z') {
                    double v1[1];
                    if (vnums(c, 1, v1)) {
                        if (set_f(c->st, a_horizontal_scale, v1[0]) < 0)
                            goto fail;
                        c->hs = v1[0];
                    }
                } else if (ol == 2 && op[0] == 'T' && op[1] == 's') {
                    double v1[1];
                    if (vnums(c, 1, v1)) {
                        if (set_f(c->st, a_text_rise, v1[0]) < 0)
                            goto fail;
                    }
                } else if (ol == 2 && op[0] == 'T' && op[1] == 'r') {
                    if (c->sp > 0 && c->stk[c->sp - 1].tag == V_NUM &&
                        c->stk[c->sp - 1].is_int) {
                        Val *v = &c->stk[c->sp - 1];
                        PyObject *iv = val_to_obj(v);
                        if (!iv)
                            goto fail;
                        int r = PyObject_SetAttr(c->st, a_render_mode, iv);
                        Py_DECREF(iv);
                        if (r < 0)
                            goto fail;
                    }
                } else if (ol == 2 && op[0] == 'c' && op[1] == 'm') {
                    double v6[6];
                    if (vnums(c, 6, v6)) {
                        double o0 = c->ctm[0], o1 = c->ctm[1], o2 = c->ctm[2],
                               o3 = c->ctm[3], o4 = c->ctm[4], o5 = c->ctm[5];
                        double nc[6];
                        nc[0] = v6[0] * o0 + v6[1] * o2;
                        nc[1] = v6[0] * o1 + v6[1] * o3;
                        nc[2] = v6[2] * o0 + v6[3] * o2;
                        nc[3] = v6[2] * o1 + v6[3] * o3;
                        nc[4] = v6[4] * o0 + v6[5] * o2 + o4;
                        nc[5] = v6[4] * o1 + v6[5] * o3 + o5;
                        memcpy(c->ctm, nc, sizeof(nc));
                        update_ctm_ident(c);
                        c->scale_dirty = 1;
                        PyObject *t = tuple6(nc[0], nc[1], nc[2], nc[3],
                                             nc[4], nc[5]);
                        if (!t)
                            goto fail;
                        int r = PyObject_SetAttr(c->st, a_ctm, t);
                        Py_DECREF(t);
                        if (r < 0)
                            goto fail;
                    }
                } else if (ol == 1 && op[0] == 'q') {
                    PyObject *ct = tuple6(c->ctm[0], c->ctm[1], c->ctm[2],
                                          c->ctm[3], c->ctm[4], c->ctm[5]);
                    if (!ct)
                        goto fail;
                    PyObject *pair = PyTuple_Pack(2, ct, c->fill_color);
                    Py_DECREF(ct);
                    if (!pair)
                        goto fail;
                    int r = PyList_Append(c->saved, pair);
                    Py_DECREF(pair);
                    if (r < 0)
                        goto fail;
                } else if (ol == 1 && op[0] == 'Q') {
                    Py_ssize_t sl = PyList_GET_SIZE(c->saved);
                    if (sl > 0) {
                        PyObject *pair = PyList_GET_ITEM(c->saved, sl - 1);
                        Py_INCREF(pair);
                        if (PyList_SetSlice(c->saved, sl - 1, sl, NULL) < 0) {
                            Py_DECREF(pair);
                            goto fail;
                        }
                        /* entries are (ctm, fill_color) 2-tuples; anything
                         * else (external mutation of st.saved, a future
                         * format change) must raise, not segfault */
                        if (!PyTuple_Check(pair) ||
                            PyTuple_GET_SIZE(pair) != 2) {
                            PyErr_SetString(
                                PyExc_TypeError,
                                "saved graphics entry is not a "
                                "(ctm, fill_color) 2-tuple");
                            Py_DECREF(pair);
                            goto fail;
                        }
                        PyObject *ct = PyTuple_GET_ITEM(pair, 0);
                        PyObject *fc = PyTuple_GET_ITEM(pair, 1);
                        if (!PyTuple_Check(ct) || PyTuple_GET_SIZE(ct) != 6) {
                            PyErr_SetString(
                                PyExc_TypeError,
                                "saved ctm is not a 6-tuple");
                            Py_DECREF(pair);
                            goto fail;
                        }
                        if (PyObject_SetAttr(c->st, a_ctm, ct) < 0 ||
                            PyObject_SetAttr(c->st, a_fill_color, fc) < 0) {
                            Py_DECREF(pair);
                            goto fail;
                        }
                        for (int i2 = 0; i2 < 6; i2++) {
                            c->ctm[i2] =
                                PyFloat_AsDouble(PyTuple_GET_ITEM(ct, i2));
                            if (c->ctm[i2] == -1.0 && PyErr_Occurred()) {
                                Py_DECREF(pair);
                                goto fail;
                            }
                        }
                        update_ctm_ident(c);
                        c->scale_dirty = 1;
                        Py_INCREF(fc);
                        Py_DECREF(c->fill_color);
                        c->fill_color = fc;
                        Py_DECREF(pair);
                    }
                } else if (ol == 1 && op[0] == 'g') {
                    double v1[1];
                    if (vnums(c, 1, v1)) {
                        PyObject *f = PyFloat_FromDouble(v1[0]);
                        if (!f)
                            goto fail;
                        PyObject *t = PyTuple_Pack(2, g_gray, f);
                        Py_DECREF(f);
                        if (!t)
                            goto fail;
                        int r = PyObject_SetAttr(c->st, a_fill_color, t);
                        if (r < 0) {
                            Py_DECREF(t);
                            goto fail;
                        }
                        Py_DECREF(c->fill_color);
                        c->fill_color = t;
                    }
                } else if (ol == 2 && op[0] == 'r' && op[1] == 'g') {
                    double v3[3];
                    if (vnums(c, 3, v3)) {
                        PyObject *t = Py_BuildValue("(Oddd)", g_rgb, v3[0],
                                                    v3[1], v3[2]);
                        if (!t)
                            goto fail;
                        int r = PyObject_SetAttr(c->st, a_fill_color, t);
                        if (r < 0) {
                            Py_DECREF(t);
                            goto fail;
                        }
                        Py_DECREF(c->fill_color);
                        c->fill_color = t;
                    }
                } else if (ol == 1 && op[0] == 'k') {
                    double v4[4];
                    if (vnums(c, 4, v4)) {
                        PyObject *t = Py_BuildValue("(Odddd)", g_cmyk, v4[0],
                                                    v4[1], v4[2], v4[3]);
                        if (!t)
                            goto fail;
                        int r = PyObject_SetAttr(c->st, a_fill_color, t);
                        if (r < 0) {
                            Py_DECREF(t);
                            goto fail;
                        }
                        Py_DECREF(c->fill_color);
                        c->fill_color = t;
                    }
                } else if (ol == 2 && op[0] == 'D' && op[1] == 'o') {
                    if (c->sp > 0 && c->stk[c->sp - 1].tag == V_NAME) {
                        PyObject *nm = c->stk[c->sp - 1].obj;
                        Py_INCREF(nm);
                        if (sync_out(c) < 0) {
                            Py_DECREF(nm);
                            goto fail;
                        }
                        PyObject *itv = c->in_text ? Py_True : Py_False;
                        if (PyObject_SetAttr(c->interp, a_in_text, itv) < 0) {
                            Py_DECREF(nm);
                            goto fail;
                        }
                        PyObject *m =
                            PyObject_GetAttr(c->interp, a_paint_xobject);
                        if (!m) {
                            Py_DECREF(nm);
                            goto fail;
                        }
                        PyObject *dep = PyLong_FromLong(c->depth);
                        if (!dep) {
                            Py_DECREF(m);
                            Py_DECREF(nm);
                            goto fail;
                        }
                        PyObject *r = PyObject_CallFunctionObjArgs(
                            m, nm, c->resources, dep, NULL);
                        Py_DECREF(dep);
                        Py_DECREF(m);
                        Py_DECREF(nm);
                        if (!r)
                            goto fail;
                        Py_DECREF(r);
                        if (resync_after_do(c) < 0)
                            goto fail;
                    }
                } else if (ol == 3 && op[0] == 'B' && op[1] == 'M' &&
                           op[2] == 'C') {
                    if (c->sp > 0 && c->stk[c->sp - 1].tag == V_NAME) {
                        if (call_method1(c, a_op_bmc,
                                         c->stk[c->sp - 1].obj) < 0)
                            goto fail;
                        if (read_noart(c) < 0)
                            goto fail;
                        if (c->layout && refresh_frag_env(c) < 0)
                            goto fail;
                    }
                } else if (ol == 3 && op[0] == 'B' && op[1] == 'D' &&
                           op[2] == 'C') {
                    /* materialize the stack and delegate the props parse +
                     * _op_bdc call (with the Python branch's sync) */
                    PyObject *lst = PyList_New(c->sp);
                    if (!lst)
                        goto fail;
                    for (Py_ssize_t i2 = 0; i2 < c->sp; i2++) {
                        PyObject *o = val_to_obj(&c->stk[i2]);
                        if (!o) {
                            Py_DECREF(lst);
                            goto fail;
                        }
                        PyList_SET_ITEM(lst, i2, o);
                    }
                    if (sync_out(c) < 0) {
                        Py_DECREF(lst);
                        goto fail;
                    }
                    PyObject *r = PyObject_CallFunctionObjArgs(
                        g_bdc_helper, c->interp, lst, c->resources, NULL);
                    Py_DECREF(lst);
                    if (!r)
                        goto fail;
                    Py_DECREF(r);
                    if (read_noart(c) < 0)
                        goto fail;
                    if (resync_in(c) < 0)
                        goto fail;
                    if (c->layout && refresh_frag_env(c) < 0)
                        goto fail;
                } else if (ol == 3 && op[0] == 'E' && op[1] == 'M' &&
                           op[2] == 'C') {
                    if (sync_out(c) < 0)
                        goto fail;
                    PyObject *m = PyObject_GetAttr(c->interp, a_op_emc);
                    if (!m)
                        goto fail;
                    PyObject *r = PyObject_CallNoArgs(m);
                    Py_DECREF(m);
                    if (!r)
                        goto fail;
                    Py_DECREF(r);
                    if (read_noart(c) < 0)
                        goto fail;
                    if (resync_in(c) < 0)
                        goto fail;
                    if (c->layout && refresh_frag_env(c) < 0)
                        goto fail;
                } else if (ol == 2 && op[0] == 'B' && op[1] == 'I') {
                    stack_clear(c);
                    PyObject *pp = PyLong_FromSsize_t(pos);
                    if (!pp)
                        goto fail;
                    PyObject *r = PyObject_CallFunctionObjArgs(
                        g_bi_helper, c->interp, c->data_obj, pp, NULL);
                    Py_DECREF(pp);
                    if (!r)
                        goto fail;
                    Py_ssize_t np = PyLong_AsSsize_t(r);
                    Py_DECREF(r);
                    if (np == -1 && PyErr_Occurred())
                        goto fail;
                    pos = np;
                    continue; /* restart: no stack clear tail, no show */
                } else if (ol == 2 && op[0] == 'I' && op[1] == 'D') {
                    /* stray ID: resync; swallowed payload becomes an operand
                     * no pop accepts (_InlineTok) */
                    stack_clear(c);
                    Py_ssize_t np = pos;
                    PyObject *payload = read_inline_data(c, &np);
                    if (!payload)
                        goto fail;
                    PyObject *tok =
                        PyObject_CallOneArg(g_inline_tok, payload);
                    Py_DECREF(payload);
                    if (!tok)
                        goto fail;
                    Val v = {V_OBJ, 0, 0, 0.0, 0, NULL, 0, tok};
                    if (stack_push(c, v) < 0)
                        goto fail;
                    pos = np;
                    continue;
                }
                /* every other operator: operands discarded unparsed */
                stack_clear(c);
                if (tbp != NULL || tbo != NULL) {
                    int r = do_show(c, tbp, tbl, tbo);
                    Py_XDECREF(tbo);
                    if (r < 0)
                        goto fail;
                }
                continue;
            }
        }
    }

    /* ---- finally: flush hot state back (mirror of the Python finally) -- */
    if (set_matrices(c) < 0)
        goto fail_nosync;
    {
        PyObject *itv = c->in_text ? Py_True : Py_False;
        if (PyObject_SetAttr(c->interp, a_in_text, itv) < 0)
            goto fail_nosync;
    }
    if (sync_counters_out(c) < 0)
        goto fail_nosync;
    stack_clear(c);
    free(c->stk);
    Py_DECREF(c->st);
    Py_DECREF(c->opts);
    Py_DECREF(c->text_parts);
    Py_DECREF(c->font_memo);
    Py_DECREF(c->decode_meth);
    Py_DECREF(c->saved);
    Py_DECREF(c->fill_color);
    Py_XDECREF(c->tf_name);
    Py_XDECREF(c->fragments);
    Py_XDECREF(c->font_name);
    Py_XDECREF(c->cur_mcid);
    Py_XDECREF(c->cur_tag);
    Py_XDECREF(c->pending);
    Py_RETURN_NONE;

fail:
    /* exception path: the Python loop's try/finally still writes the hot
     * state back — mirror that, preserving the in-flight exception */
    {
        PyObject *et, *ev, *tb;
        PyErr_Fetch(&et, &ev, &tb);
        set_matrices(c);
        PyObject *itv = c->in_text ? Py_True : Py_False;
        PyObject_SetAttr(c->interp, a_in_text, itv);
        sync_counters_out(c);
        PyErr_Restore(et, ev, tb);
    }
fail_nosync:
    stack_clear(c);
    free(c->stk);
    Py_XDECREF(c->st);
    Py_XDECREF(c->opts);
    Py_XDECREF(c->text_parts);
    Py_XDECREF(c->font_memo);
    Py_XDECREF(c->decode_meth);
    Py_XDECREF(c->saved);
    Py_XDECREF(c->fill_color);
    Py_XDECREF(c->tf_name);
    Py_XDECREF(c->fragments);
    Py_XDECREF(c->font_name);
    Py_XDECREF(c->cur_mcid);
    Py_XDECREF(c->cur_tag);
    Py_XDECREF(c->pending);
    return NULL;

fail_early:
    Py_XDECREF(c->st);
    Py_XDECREF(c->opts);
    Py_XDECREF(c->text_parts);
    Py_XDECREF(c->font_memo);
    Py_XDECREF(c->decode_meth);
    Py_XDECREF(c->saved);
    Py_XDECREF(c->fill_color);
    Py_XDECREF(c->tf_name);
    Py_XDECREF(c->fragments);
    Py_XDECREF(c->font_name);
    Py_XDECREF(c->cur_mcid);
    Py_XDECREF(c->cur_tag);
    Py_XDECREF(c->pending);
    return NULL;
}

/* ========================================================================
 * Indirect-object fast parse (objects.py Lexer + parse_object + the
 * reader's `N G obj … [stream]` header walk, reader.py:187).
 *
 * Happy-path only: ANY shape this parser is not byte-certain about —
 * malformed hex, lone '>', '{'/'}', unexpected keywords, oversized
 * integers, depth overflows — returns a BAIL (Python result None) and the
 * caller re-parses from the same offset with the pure-Python path, whose
 * error behavior is the contract. Encrypted documents skip this path
 * entirely (the wrapper checks the decryptor).
 * ======================================================================== */

static PyObject *g_ref_cls;          /* objects.Ref */
static PyObject *g_obj_name_memo;    /* objects._NAME_MEMO */
static PyObject *g_decode_name_obj;  /* Lexer._decode_name_bytes */

typedef struct {
    const unsigned char *d;
    Py_ssize_t n, pos;
    int bail; /* set → return None, caller falls back to Python */
} OLex;

#define OBJ_MAX_DEPTH 128 /* objects.MAX_PARSE_DEPTH */

static void o_skip(OLex *o)
{
    const unsigned char *d = o->d;
    Py_ssize_t n = o->n, p = o->pos;
    for (;;) {
        while (p < n && is_ws1(d[p]))
            p++;
        if (p < n && d[p] == '%') { /* object-land comments end at \n only */
            while (p < n && d[p] != '\n')
                p++;
            if (p < n)
                p++;
            continue;
        }
        break;
    }
    o->pos = p;
}

/* name token after '/': raw (incl. slash) keys objects._NAME_MEMO */
static PyObject *o_name(OLex *o)
{
    const unsigned char *d = o->d;
    Py_ssize_t n = o->n, p = o->pos + 1, start = o->pos;
    while (p < n && !is_ws1(d[p]) && !is_bound(d[p]))
        p++;
    /* is_bound == ws + delimiters; '/' itself is a delimiter (name ends) */
    PyObject *key =
        PyBytes_FromStringAndSize((const char *)(d + start), p - start);
    if (!key)
        return NULL;
    o->pos = p;
    PyObject *nm = PyDict_GetItemWithError(g_obj_name_memo, key);
    if (nm) {
        Py_INCREF(nm);
        Py_DECREF(key);
        return nm;
    }
    if (PyErr_Occurred()) {
        Py_DECREF(key);
        return NULL;
    }
    if (PyDict_GET_SIZE(g_obj_name_memo) > 8192)
        PyDict_Clear(g_obj_name_memo);
    PyObject *inner =
        PyBytes_FromStringAndSize((const char *)(d + start + 1), p - start - 1);
    if (!inner) {
        Py_DECREF(key);
        return NULL;
    }
    nm = PyObject_CallOneArg(g_decode_name_obj, inner);
    Py_DECREF(inner);
    if (!nm) {
        Py_DECREF(key);
        return NULL;
    }
    if (PyDict_SetItem(g_obj_name_memo, key, nm) < 0) {
        Py_DECREF(key);
        Py_DECREF(nm);
        return NULL;
    }
    Py_DECREF(key);
    return nm;
}

/* literal string (objects.Lexer._read_literal_string — same escape rules
 * as the content reader) */
static PyObject *o_literal(OLex *o)
{
    Py_ssize_t p = o->pos + 1;
    Ctx dummy;
    dummy.data = o->d;
    dummy.n = o->n;
    PyObject *r = read_literal(&dummy, &p);
    o->pos = p;
    return r;
}

/* hex string per the SLOW reader (_read_hex_string): EOF-terminates,
 * invalid char → bail (Python raises PdfParseError) */
static PyObject *o_hex(OLex *o)
{
    const unsigned char *d = o->d;
    Py_ssize_t n = o->n, p = o->pos + 1;
    char small[256];
    Py_ssize_t cap = sizeof(small), m = 0;
    char *buf = small;
    while (p < n) {
        unsigned char ch = d[p];
        if (ch == '>') {
            p++;
            break;
        }
        if (hex_digit(ch) >= 0) {
            if (m >= cap) {
                Py_ssize_t nc = cap * 2;
                char *nb = (char *)malloc((size_t)nc);
                if (!nb) {
                    if (buf != small)
                        free(buf);
                    return PyErr_NoMemory();
                }
                memcpy(nb, buf, (size_t)m);
                if (buf != small)
                    free(buf);
                buf = nb;
                cap = nc;
            }
            buf[m++] = (char)ch;
        } else if (!is_ws1(ch)) {
            if (buf != small)
                free(buf);
            o->bail = 1;
            return NULL;
        }
        p++;
    }
    o->pos = p;
    PyObject *out = PyBytes_FromStringAndSize(NULL, (m + 1) / 2);
    if (!out) {
        if (buf != small)
            free(buf);
        return NULL;
    }
    unsigned char *ob = (unsigned char *)PyBytes_AS_STRING(out);
    for (Py_ssize_t i = 0; i < m; i += 2) {
        int hi = hex_digit((unsigned char)buf[i]);
        int lo = (i + 1 < m) ? hex_digit((unsigned char)buf[i + 1]) : 0;
        ob[i / 2] = (unsigned char)((hi << 4) | lo);
    }
    if (buf != small)
        free(buf);
    return out;
}

/* integer token starting at pos (already classified); 0 on bail */
static int o_int(OLex *o, long long *out, int *neg_sign)
{
    int is_int = 0;
    Py_ssize_t tl = scan_number(o->d + o->pos, o->n - o->pos, &is_int);
    if (tl <= 0 || !is_int || tl > 18) {
        o->bail = 1;
        return 0;
    }
    const unsigned char *p = o->d + o->pos;
    long long v = 0;
    Py_ssize_t k = 0;
    int neg = 0;
    if (p[0] == '+' || p[0] == '-') {
        neg = p[0] == '-';
        k = 1;
    }
    for (; k < tl; k++)
        v = v * 10 + (p[k] - '0');
    *out = neg ? -v : v;
    if (neg_sign)
        *neg_sign = neg;
    o->pos += tl;
    return 1;
}

static PyObject *o_value(OLex *o, int depth);

/* classify the token starting at o->pos (after o_skip) WITHOUT consuming:
 * 1 = the lexer would produce a token without raising, 0 = it could raise
 * or recurse unpredictably (lone '>', invalid hex, ')', lone sign) — the
 * reference-lookahead dance reads tokens it may then push back, so their
 * ERROR behavior leaks even for non-refs. */
static int o_peek_ok(OLex *o)
{
    const unsigned char *d = o->d;
    Py_ssize_t n = o->n, p = o->pos;
    if (p >= n)
        return 1; /* eof token */
    unsigned char ch = d[p];
    if ((ch >= '0' && ch <= '9') || ch == '+' || ch == '-' || ch == '.') {
        int ii = 0;
        return scan_number(d + p, n - p, &ii) > 0 ? 1 : 0;
    }
    if (ch == '/' || ch == '(' || ch == '[' || ch == ']' || ch == '{' ||
        ch == '}')
        return 1; /* name/string/markers/brace-kw never raise */
    if (ch == '<') {
        if (p + 1 < n && d[p + 1] == '<')
            return 1;
        p++;
        while (p < n) {
            unsigned char x = d[p];
            if (x == '>')
                return 1;
            if (hex_digit(x) < 0 && !is_ws1(x))
                return 0; /* _read_hex_string raises */
            p++;
        }
        return 1; /* EOF-terminated hex: slow reader tolerates */
    }
    if (ch == '>')
        return (p + 1 < n && d[p + 1] == '>') ? 1 : 0;
    if (ch == ')')
        return 0; /* silent-skip + recursion: conservative */
    return 1; /* keyword run */
}

/* skip ONE raw token (the dict junk-key tolerance path: non-name tokens
 * between dict entries are discarded token-wise, not value-wise) */
static int o_skip_token(OLex *o)
{
    o_skip(o);
    if (o->pos >= o->n) {
        o->bail = 1; /* EOF inside dict → Python raises */
        return 0;
    }
    const unsigned char *d = o->d;
    unsigned char ch = d[o->pos];
    if (ch == '[' || ch == ']') {
        o->pos++;
        return 1;
    }
    if (ch == '<') {
        if (o->pos + 1 < o->n && d[o->pos + 1] == '<') {
            o->pos += 2;
            return 1;
        }
        PyObject *h = o_hex(o);
        if (!h)
            return 0;
        Py_DECREF(h);
        return 1;
    }
    if (ch == '(') {
        PyObject *s = o_literal(o);
        if (!s)
            return 0;
        Py_DECREF(s);
        return 1;
    }
    if ((ch >= '0' && ch <= '9') || ch == '+' || ch == '-' || ch == '.') {
        int is_int = 0;
        Py_ssize_t tl = scan_number(o->d + o->pos, o->n - o->pos, &is_int);
        if (tl > 0) {
            o->pos += tl;
            return 1;
        }
        /* lone +/-/.: the slow lexer skips the byte and recurses into the
         * NEXT token, which can itself raise — bail */
        o->bail = 1;
        return 0;
    }
    /* '>' alone, '{', '}', junk delimiters, keywords: bail — the Python
     * path's behavior (raise / silent skip / kw) decides */
    if (!is_bound(ch) || ch == '/') {
        if (ch == '/') {
            PyObject *nm = o_name(o);
            if (!nm)
                return 0;
            Py_DECREF(nm);
            return 1;
        }
        /* keyword run */
        Py_ssize_t p = o->pos;
        while (p < o->n && !is_ws1(d[p]) && !is_bound(d[p]))
            p++;
        o->pos = p;
        return 1;
    }
    o->bail = 1;
    return 0;
}

static PyObject *o_value(OLex *o, int depth)
{
    if (depth > OBJ_MAX_DEPTH) {
        o->bail = 1;
        return NULL;
    }
    o_skip(o);
    if (o->pos >= o->n) {
        o->bail = 1;
        return NULL;
    }
    const unsigned char *d = o->d;
    Py_ssize_t n = o->n;
    unsigned char ch = d[o->pos];
    if ((ch >= '0' && ch <= '9') || ch == '+' || ch == '-' || ch == '.') {
        int is_int = 0;
        Py_ssize_t tl = scan_number(d + o->pos, n - o->pos, &is_int);
        if (tl <= 0) {
            o->bail = 1; /* lone +/-/. → slow-path garbage handling */
            return NULL;
        }
        if (!is_int) {
            double v = parse_double(d + o->pos, tl);
            o->pos += tl;
            return PyFloat_FromDouble(v);
        }
        long long val;
        o->pos -= 0;
        {
            Py_ssize_t save0 = o->pos;
            if (!o_int(o, &val, NULL)) {
                o->pos = save0;
                return NULL; /* bail set (huge int) */
            }
        }
        /* `n g R` reference lookahead (parse_object:402-419). The Python
         * token-wise dance READS up to two more tokens and pushes the
         * non-matching ones back — so a following token the lexer would
         * RAISE on (lone '>', bad hex) raises even when no Ref forms;
         * mirror by validating peeks and bailing on the uncertain ones. */
        if (val >= 0) {
            Py_ssize_t save = o->pos;
            o_skip(o);
            int is_int2 = 0;
            Py_ssize_t tl2 =
                scan_number(d + o->pos, n - o->pos, &is_int2);
            if (tl2 > 0 && is_int2 && tl2 > 18) {
                /* huge generation: Python may build Ref(val, bigint) or
                 * raise later — let Python decide */
                o->bail = 1;
                return NULL;
            }
            if (tl2 > 0 && is_int2) {
                long long gen;
                int neg = 0;
                if (!o_int(o, &gen, &neg)) {
                    o->pos = save;
                    return NULL; /* bail already set */
                }
                if (gen >= 0) {
                    Py_ssize_t save2 = o->pos;
                    o_skip(o);
                    Py_ssize_t p = o->pos;
                    if (p < n && d[p] == 'R' &&
                        (p + 1 >= n ||
                         is_ws1(d[p + 1]) || is_bound(d[p + 1]))) {
                        o->pos = p + 1;
                        return PyObject_CallFunction(
                            g_ref_cls, "LL", val, gen);
                    }
                    /* t3 is read then pushed back: its lexing must not
                     * raise */
                    if (!o_peek_ok(o)) {
                        o->bail = 1;
                        return NULL;
                    }
                    o->pos = save2;
                    o->pos = save;
                } else
                    o->pos = save; /* negative gen: t3 never read */
            } else {
                /* t2 is read then pushed back: validate its lexing */
                if (!o_peek_ok(o)) {
                    o->bail = 1;
                    return NULL;
                }
                o->pos = save;
            }
        }
        return PyLong_FromLongLong(val);
    }
    if (ch == '/')
        return o_name(o);
    if (ch == '(')
        return o_literal(o);
    if (ch == '<') {
        if (o->pos + 1 < n && d[o->pos + 1] == '<') {
            o->pos += 2;
            PyObject *dict = PyDict_New();
            if (!dict)
                return NULL;
            for (;;) {
                o_skip(o);
                if (o->pos >= n) {
                    o->bail = 1; /* unterminated dict → Python raises */
                    Py_DECREF(dict);
                    return NULL;
                }
                unsigned char kc = d[o->pos];
                if (kc == '>' && o->pos + 1 < n && d[o->pos + 1] == '>') {
                    o->pos += 2;
                    return dict;
                }
                if (kc != '/') {
                    /* junk key tolerance: discard ONE token */
                    if (!o_skip_token(o)) {
                        Py_DECREF(dict);
                        return NULL;
                    }
                    continue;
                }
                PyObject *nm = o_name(o);
                if (!nm) {
                    Py_DECREF(dict);
                    return NULL;
                }
                PyObject *keystr = PyObject_Str(nm); /* str(Name) key */
                Py_DECREF(nm);
                if (!keystr) {
                    Py_DECREF(dict);
                    return NULL;
                }
                PyObject *v = o_value(o, depth + 1);
                if (!v) {
                    Py_DECREF(keystr);
                    Py_DECREF(dict);
                    return NULL;
                }
                int r = PyDict_SetItem(dict, keystr, v);
                Py_DECREF(keystr);
                Py_DECREF(v);
                if (r < 0) {
                    Py_DECREF(dict);
                    return NULL;
                }
            }
        }
        return o_hex(o);
    }
    if (ch == '[') {
        o->pos++;
        PyObject *arr = PyList_New(0);
        if (!arr)
            return NULL;
        for (;;) {
            o_skip(o);
            if (o->pos >= n) {
                o->bail = 1; /* unterminated array → Python raises */
                Py_DECREF(arr);
                return NULL;
            }
            if (d[o->pos] == ']') {
                o->pos++;
                return arr;
            }
            PyObject *v = o_value(o, depth + 1);
            if (!v) {
                Py_DECREF(arr);
                return NULL;
            }
            int r = PyList_Append(arr, v);
            Py_DECREF(v);
            if (r < 0) {
                Py_DECREF(arr);
                return NULL;
            }
        }
    }
    /* keyword (true/false/null); anything else → bail */
    if (!is_bound(ch)) {
        Py_ssize_t p = o->pos;
        while (p < n && !is_ws1(d[p]) && !is_bound(d[p]))
            p++;
        Py_ssize_t kl = p - o->pos;
        const unsigned char *kp = d + o->pos;
        if (kl == 4 && memcmp(kp, "true", 4) == 0) {
            o->pos = p;
            Py_RETURN_TRUE;
        }
        if (kl == 5 && memcmp(kp, "false", 5) == 0) {
            o->pos = p;
            Py_RETURN_FALSE;
        }
        if (kl == 4 && memcmp(kp, "null", 4) == 0) {
            o->pos = p;
            Py_RETURN_NONE;
        }
    }
    o->bail = 1; /* unexpected token/keyword/')'/'>' → Python path decides */
    return NULL;
}

static PyObject *parse_indirect(PyObject *self, PyObject *args)
{
    PyObject *data_obj;
    Py_ssize_t offset;
    if (!PyArg_ParseTuple(args, "On", &data_obj, &offset))
        return NULL;
    if (!PyBytes_Check(data_obj)) {
        PyErr_SetString(PyExc_TypeError, "data must be bytes");
        return NULL;
    }
    OLex o;
    o.d = (const unsigned char *)PyBytes_AS_STRING(data_obj);
    o.n = PyBytes_GET_SIZE(data_obj);
    o.pos = offset >= 0 ? offset : 0;
    o.bail = 0;
    long long num, gen;
    o_skip(&o);
    if (o.pos >= o.n || !((o.d[o.pos] >= '0' && o.d[o.pos] <= '9') ||
                          o.d[o.pos] == '+' || o.d[o.pos] == '-'))
        Py_RETURN_NONE; /* no header → Python raises its exact error */
    if (!o_int(&o, &num, NULL))
        goto maybe_bail;
    o_skip(&o);
    if (!(o.pos < o.n && ((o.d[o.pos] >= '0' && o.d[o.pos] <= '9') ||
                          o.d[o.pos] == '+' || o.d[o.pos] == '-')))
        Py_RETURN_NONE;
    if (!o_int(&o, &gen, NULL))
        goto maybe_bail;
    o_skip(&o);
    if (!(o.pos + 2 < o.n && memcmp(o.d + o.pos, "obj", 3) == 0 &&
          (o.pos + 3 >= o.n ||
           is_ws1(o.d[o.pos + 3]) || is_bound(o.d[o.pos + 3]))))
        Py_RETURN_NONE;
    o.pos += 3;
    {
        PyObject *value = o_value(&o, 0);
        if (!value)
            goto maybe_bail;
        /* post-value token: Python consumes exactly one token here and
         * only `stream` matters — but its next_token can RAISE (lone '>',
         * invalid hex), so the peek must validate like the lexer: bail on
         * anything uncertain instead of silently succeeding. */
        o_skip(&o);
        int has_stream = 0;
        if (o.pos < o.n) {
            unsigned char pc = o.d[o.pos];
            int numlike = (pc >= '0' && pc <= '9') || pc == '+' ||
                          pc == '-' || pc == '.';
            if (!numlike && (pc == '/' || (!is_ws1(pc) && !is_bound(pc)))) {
                Py_ssize_t p = o.pos + (pc == '/' ? 1 : 0);
                while (p < o.n && !is_ws1(o.d[p]) && !is_bound(o.d[p]))
                    p++;
                if (pc != '/' && p - o.pos == 6 &&
                    memcmp(o.d + o.pos, "stream", 6) == 0) {
                    has_stream = 1;
                    o.pos = p;
                    if (!PyDict_Check(value)) {
                        /* "stream keyword after non-dict object" */
                        Py_DECREF(value);
                        Py_RETURN_NONE;
                    }
                }
                /* other keyword/name (endobj, …): harmless, pos unused */
            } else {
                /* delimiter-led token: validate it the lexer's way; a
                 * token the lexer would raise on → bail to Python */
                if (!o_skip_token(&o)) {
                    Py_DECREF(value);
                    goto maybe_bail;
                }
            }
        }
        PyObject *r = Py_BuildValue("(LLOin)", num, gen, value,
                                    has_stream, o.pos);
        Py_DECREF(value);
        return r;
    }
maybe_bail:
    if (o.bail && !PyErr_Occurred())
        Py_RETURN_NONE;
    return NULL; /* real exception (memory, callback failure) */
}

/* ========================================================================
 * HTML fast path: a transcription of CPython 3.11 html/parser.py's
 * HTMLParser (convert_charrefs=True, whole-document feed+close) FUSED
 * with html_extract._MainContentParser's consumer logic.  Operates on
 * the document's UTF-8 bytes (all markup delimiters are ASCII; multi-
 * byte sequences never contain ASCII bytes, so byte positions are safe
 * segment boundaries).  ANY construct the transcription is not certain
 * about — marked sections, non-ASCII tag/attr names, undecodable
 * chunks — sets h->bail and the caller re-runs the pure-Python path,
 * which remains the behavior authority (differential-pinned, same
 * discipline as parse_indirect).
 * ======================================================================== */

static PyObject *g_unescape;     /* html.unescape */
static PyObject *g_ws_collapse;  /* html_extract helper: _WS.sub(' ',s).strip() */
static PyObject *g_boiler_value; /* html_extract helper: hint match on value */
static PyObject *g_ev_text, *g_ev_img; /* event kind strings */
static PyObject *g_lt_str;             /* "<" */

/* memmem replacement for the two-byte needle case (portable) */
static const unsigned char *h_find2(const unsigned char *hay, size_t n,
                                    unsigned char a, unsigned char b)
{
    const unsigned char *p = hay, *end = hay + n;
    while (p + 1 < end) {
        p = (const unsigned char *)memchr(p, a, (size_t)(end - p - 1));
        if (!p)
            return NULL;
        if (p[1] == b)
            return p;
        p++;
    }
    return NULL;
}

/* one unicode char at byte pos: *clen = byte length; returns codepoint or
 * -1 on malformed UTF-8 (caller bails) */
static long u8_char_at(const unsigned char *d, Py_ssize_t n, Py_ssize_t pos,
                       int *clen)
{
    unsigned char b = d[pos];
    if (b < 0x80) {
        *clen = 1;
        return b;
    }
    if ((b & 0xe0) == 0xc0 && pos + 1 < n) {
        *clen = 2;
        return ((long)(b & 0x1f) << 6) | (d[pos + 1] & 0x3f);
    }
    if ((b & 0xf0) == 0xe0 && pos + 2 < n) {
        *clen = 3;
        return ((long)(b & 0x0f) << 12) | ((long)(d[pos + 1] & 0x3f) << 6) |
               (d[pos + 2] & 0x3f);
    }
    if ((b & 0xf8) == 0xf0 && pos + 3 < n) {
        *clen = 4;
        return ((long)(b & 0x07) << 18) | ((long)(d[pos + 1] & 0x3f) << 12) |
               ((long)(d[pos + 2] & 0x3f) << 6) | (d[pos + 3] & 0x3f);
    }
    *clen = 1;
    return -1;
}

/* is the char AT byte pos a regex-\s char (Py_UNICODE_ISSPACE — the same
 * predicate re's unicode \s uses)? *clen = its byte length */
static int u8_isspace_at(const unsigned char *d, Py_ssize_t n,
                         Py_ssize_t pos, int *clen, int *bad)
{
    long cp = u8_char_at(d, n, pos, clen);
    if (cp < 0) {
        *bad = 1;
        return 0;
    }
    return Py_UNICODE_ISSPACE((Py_UCS4)cp);
}

/* byte length of the char ENDING at byte index end-1 (walk back over
 * continuation bytes); returns start index */
static Py_ssize_t u8_char_start_before(const unsigned char *d,
                                       Py_ssize_t end)
{
    Py_ssize_t s = end - 1;
    while (s > 0 && (d[s] & 0xc0) == 0x80)
        s--;
    return s;
}

typedef struct {
    PyObject *tag;      /* lowercased tag str (owned) */
    unsigned char drops, boils, is_a;
} HElem;

typedef struct {
    const unsigned char *d;
    Py_ssize_t n;
    HElem *stack;
    Py_ssize_t sp, cap;
    int drop_depth, boiler_depth, anchor_depth;
    PyObject *seg;       /* list of str */
    long long seg_link;
    PyObject *events;    /* list of ("text", raw, link) | ("img", src) */
    PyObject *links;     /* list of (href, text) */
    PyObject *anchors;   /* list of [href, parts-list] */
    PyObject *cdata;     /* lowercased cdata elem (script/style) or NULL */
    int bail;
} H;

/* tag-name byte: [^\t\n\r\f />\x00] */
static int h_namebyte(unsigned char b)
{
    return !(b == 0x09 || b == 0x0a || b == 0x0c || b == 0x0d ||
             b == ' ' || b == '/' || b == '>' || b == 0x00);
}

static int h_push(H *h, PyObject *tag, int drops, int boils, int is_a)
{
    if (h->sp >= h->cap) {
        Py_ssize_t nc = h->cap ? h->cap * 2 : 32;
        HElem *ns = (HElem *)realloc(h->stack, nc * sizeof(HElem));
        if (!ns) {
            PyErr_NoMemory();
            return -1;
        }
        h->stack = ns;
        h->cap = nc;
    }
    Py_INCREF(tag);
    h->stack[h->sp].tag = tag;
    h->stack[h->sp].drops = (unsigned char)drops;
    h->stack[h->sp].boils = (unsigned char)boils;
    h->stack[h->sp].is_a = (unsigned char)is_a;
    h->sp++;
    return 0;
}

static const char *const H_DROP[] = {
    "script", "style", "template", "noscript", "svg", "head", NULL,
};
static const char *const H_BOILER_TAGS[] = {
    "nav", "header", "footer", "aside", "form", "button", NULL,
};
static const char *const H_BLOCK[] = {
    "p", "div", "section", "article", "main", "body", "li", "td", "th",
    "h1", "h2", "h3", "h4", "h5", "h6", "blockquote", "pre",
    "figcaption", "ul", "ol", "table", "tr", NULL,
};
static const char *const H_VOID[] = {
    "br", "hr", "img", "meta", "link", "input", "wbr", "source", NULL,
};
/* _BOILER_HINT plain-substring needles (the \bad\b case is special) */
static const char *const H_HINT[] = {
    "nav", "menu", "sidebar", "side-bar", "footer", "header", "banner",
    "breadcrumb", "ads", "advert", "cookie", "consent", "popup", "modal",
    "share", "social", "comment", "related", "promo", "subscribe",
    "newsletter", NULL,
};

static int h_in_set(PyObject *tag, const char *const set[])
{
    const char *t = PyUnicode_AsUTF8(tag);
    if (!t)
        return -1;
    for (int i = 0; set[i]; i++)
        if (strcmp(t, set[i]) == 0)
            return 1;
    return 0;
}

/* _BOILER_HINT.search(value) — IGNORECASE substring alternation plus
 * \bad\b.  ASCII-only fast path; any byte >= 0x80 delegates to the
 * Python helper (unicode word-boundary semantics for \b). */
static int h_hint_match(H *h, PyObject *value)
{
    Py_ssize_t vn;
    const char *vs = PyUnicode_AsUTF8AndSize(value, &vn);
    if (!vs)
        return -1;
    for (Py_ssize_t i = 0; i < vn; i++)
        if ((unsigned char)vs[i] >= 0x80) {
            PyObject *r = PyObject_CallOneArg(g_boiler_value, value);
            if (!r)
                return -1;
            int t = PyObject_IsTrue(r);
            Py_DECREF(r);
            return t;
        }
    /* lowercase copy (ASCII) */
    char buf_small[256];
    char *low = vn < (Py_ssize_t)sizeof(buf_small)
                    ? buf_small
                    : (char *)malloc((size_t)vn + 1);
    if (!low) {
        PyErr_NoMemory();
        return -1;
    }
    for (Py_ssize_t i = 0; i < vn; i++) {
        char ch = vs[i];
        low[i] = (ch >= 'A' && ch <= 'Z') ? ch + 32 : ch;
    }
    low[vn] = 0;
    int hit = 0;
    for (int i = 0; H_HINT[i]; i++)
        if (strstr(low, H_HINT[i])) {
            hit = 1;
            break;
        }
    if (!hit) {
        /* \bad\b: 'ad' not flanked by [a-zA-Z0-9_] */
        for (const char *p = low; (p = strstr(p, "ad")) != NULL; p++) {
            int lb = p == low ||
                     !(isalnum((unsigned char)p[-1]) || p[-1] == '_');
            char after = p[2];
            int rb = after == 0 ||
                     !(isalnum((unsigned char)after) || after == '_');
            if (lb && rb) {
                hit = 1;
                break;
            }
        }
    }
    if (low != buf_small)
        free(low);
    return hit;
}

/* regex-\s collapsed-and-stripped LENGTH of a str (the seg_link counter:
 * len(_WS.sub(' ', data).strip())) */
static long long h_collapsed_len(PyObject *s)
{
    Py_ssize_t len = PyUnicode_GET_LENGTH(s);
    int kind = PyUnicode_KIND(s);
    const void *data = PyUnicode_DATA(s);
    long long count = 0;
    int in_space = 0, started = 0;
    long long pending_space = 0;
    for (Py_ssize_t i = 0; i < len; i++) {
        Py_UCS4 ch = PyUnicode_READ(kind, data, i);
        if (Py_UNICODE_ISSPACE(ch)) {
            if (started && !in_space)
                pending_space = 1;
            in_space = 1;
        } else {
            count += pending_space + 1;
            pending_space = 0;
            in_space = 0;
            started = 1;
        }
    }
    return count;
}

static int h_flush(H *h)
{
    if (PyList_GET_SIZE(h->seg) == 0)
        return 0;
    PyObject *txt = PyList_GET_SIZE(h->seg) == 1
                        ? Py_NewRef(PyList_GET_ITEM(h->seg, 0))
                        : PyUnicode_Join(g_empty, h->seg);
    if (!txt)
        return -1;
    PyObject *ev = Py_BuildValue("(OOL)", g_ev_text, txt, h->seg_link);
    Py_DECREF(txt);
    if (!ev)
        return -1;
    int rc = PyList_Append(h->events, ev);
    Py_DECREF(ev);
    if (rc < 0)
        return -1;
    if (PyList_SetSlice(h->seg, 0, PyList_GET_SIZE(h->seg), NULL) < 0)
        return -1;
    h->seg_link = 0;
    return 0;
}

/* handle_data(txt) — the consumer body */
static int h_data(H *h, PyObject *txt)
{
    Py_ssize_t tlen = PyUnicode_GET_LENGTH(txt);
    if (PyList_GET_SIZE(h->anchors) && !h->drop_depth && tlen) {
        PyObject *top = PyList_GET_ITEM(h->anchors,
                                        PyList_GET_SIZE(h->anchors) - 1);
        if (PyList_Append(PyList_GET_ITEM(top, 1), txt) < 0)
            return -1;
    }
    if (h->drop_depth || h->boiler_depth)
        return 0;
    if (!tlen)
        return 0;
    {
        /* data.isspace() — all-space strings are skipped */
        int kind = PyUnicode_KIND(txt);
        const void *data = PyUnicode_DATA(txt);
        int allspace = 1;
        for (Py_ssize_t i = 0; i < tlen; i++)
            if (!Py_UNICODE_ISSPACE(PyUnicode_READ(kind, data, i))) {
                allspace = 0;
                break;
            }
        if (allspace)
            return 0;
    }
    if (PyList_Append(h->seg, txt) < 0)
        return -1;
    if (h->anchor_depth)
        h->seg_link += h_collapsed_len(txt);
    return 0;
}

/* close one anchor: pop the top [href, parts], record the link */
static int h_close_anchor(H *h)
{
    Py_ssize_t an = PyList_GET_SIZE(h->anchors);
    if (h->anchor_depth > 0)
        h->anchor_depth--;
    if (!an)
        return 0;
    PyObject *top = PyList_GET_ITEM(h->anchors, an - 1); /* borrowed */
    Py_INCREF(top);
    if (PyList_SetSlice(h->anchors, an - 1, an, NULL) < 0) {
        Py_DECREF(top);
        return -1;
    }
    PyObject *href = PyList_GET_ITEM(top, 0);
    if (PyUnicode_GET_LENGTH(href)) {
        PyObject *joined = PyUnicode_Join(g_empty, PyList_GET_ITEM(top, 1));
        if (!joined) {
            Py_DECREF(top);
            return -1;
        }
        PyObject *coll = PyObject_CallOneArg(g_ws_collapse, joined);
        Py_DECREF(joined);
        if (!coll) {
            Py_DECREF(top);
            return -1;
        }
        PyObject *pair = PyTuple_Pack(2, href, coll);
        Py_DECREF(coll);
        if (!pair) {
            Py_DECREF(top);
            return -1;
        }
        int rc = PyList_Append(h->links, pair);
        Py_DECREF(pair);
        if (rc < 0) {
            Py_DECREF(top);
            return -1;
        }
    }
    Py_DECREF(top);
    return 0;
}

/* handle_starttag(tag, attrs) — consumer body; src/href = last-seen attr
 * values (dict(attrs).get semantics), hint_hit = any class/id/role value
 * matching _BOILER_HINT */
static int h_start(H *h, PyObject *tag, PyObject *src, PyObject *href,
                   int hint_hit)
{
    int v = h_in_set(tag, H_VOID);
    if (v < 0)
        return -1;
    const char *t = PyUnicode_AsUTF8(tag);
    if (!t)
        return -1;
    if (v) {
        if (strcmp(t, "img") == 0 && !h->drop_depth && !h->boiler_depth) {
            if (h_flush(h) < 0)
                return -1;
            if (src && PyUnicode_GET_LENGTH(src)) {
                PyObject *ev = PyTuple_Pack(2, g_ev_img, src);
                if (!ev)
                    return -1;
                int rc = PyList_Append(h->events, ev);
                Py_DECREF(ev);
                if (rc < 0)
                    return -1;
            }
        } else if (strcmp(t, "br") == 0) {
            if (h_flush(h) < 0)
                return -1;
        }
        return 0;
    }
    int drops = h_in_set(tag, H_DROP);
    if (drops < 0)
        return -1;
    int boils = 0;
    if (!drops) {
        boils = h_in_set(tag, H_BOILER_TAGS);
        if (boils < 0)
            return -1;
        if (!boils)
            boils = hint_hit;
    }
    int blk = h_in_set(tag, H_BLOCK);
    if (blk < 0)
        return -1;
    if (blk || boils || drops) {
        if (h_flush(h) < 0)
            return -1;
    }
    int is_a = strcmp(t, "a") == 0;
    if (h_push(h, tag, drops, boils, is_a) < 0)
        return -1;
    if (drops)
        h->drop_depth++;
    if (boils)
        h->boiler_depth++;
    if (is_a) {
        h->anchor_depth++;
        PyObject *hv = (href && PyUnicode_GET_LENGTH(href)) ? href : g_empty;
        PyObject *parts = PyList_New(0);
        if (!parts)
            return -1;
        PyObject *entry = PyList_New(2);
        if (!entry) {
            Py_DECREF(parts);
            return -1;
        }
        Py_INCREF(hv);
        PyList_SET_ITEM(entry, 0, hv);
        PyList_SET_ITEM(entry, 1, parts);
        int rc = PyList_Append(h->anchors, entry);
        Py_DECREF(entry);
        if (rc < 0)
            return -1;
    }
    return 0;
}

/* handle_endtag(tag) */
static int h_endtag(H *h, PyObject *tag)
{
    int v = h_in_set(tag, H_VOID);
    if (v < 0)
        return -1;
    if (v)
        return 0;
    for (Py_ssize_t i = h->sp - 1; i >= 0; i--) {
        int eq = PyUnicode_Compare(h->stack[i].tag, tag);
        if (eq == -1 && PyErr_Occurred())
            return -1;
        if (eq != 0)
            continue;
        int blk = h_in_set(tag, H_BLOCK);
        if (blk < 0)
            return -1;
        if (blk || h->stack[i].boils) {
            if (h_flush(h) < 0)
                return -1;
        }
        for (Py_ssize_t k = i; k < h->sp; k++) {
            if (h->stack[k].drops && h->drop_depth > 0)
                h->drop_depth--;
            if (h->stack[k].boils && h->boiler_depth > 0)
                h->boiler_depth--;
            if (h->stack[k].is_a) {
                if (h_close_anchor(h) < 0)
                    return -1;
            }
        }
        for (Py_ssize_t k = i; k < h->sp; k++)
            Py_DECREF(h->stack[k].tag);
        h->sp = i;
        return 0;
    }
    return 0;
}

/* ---- HTML tokenizer (html/parser.py transcription) --------------------- */

/* decode a byte range to str, optionally applying html.unescape (the
 * convert_charrefs data path).  unescape short-circuits on '&'-free
 * chunks, so only chunks containing '&' pay the Python call. */
static PyObject *h_chunk(H *h, Py_ssize_t i, Py_ssize_t j, int unescape)
{
    if (i >= j)
        return Py_NewRef(g_empty);
    PyObject *s =
        PyUnicode_DecodeUTF8((const char *)h->d + i, j - i, "strict");
    if (!s) {
        PyErr_Clear();
        h->bail = 1; /* should be impossible: source was a valid str */
        return NULL;
    }
    if (unescape && memchr(h->d + i, '&', (size_t)(j - i))) {
        PyObject *r = PyObject_CallOneArg(g_unescape, s);
        Py_DECREF(s);
        return r;
    }
    return s;
}

static int h_data_range(H *h, Py_ssize_t i, Py_ssize_t j, int unescape)
{
    PyObject *s = h_chunk(h, i, j, unescape);
    if (!s)
        return -1;
    int rc = h_data(h, s);
    Py_DECREF(s);
    return rc;
}

/* skip regex-\s chars (unicode) from pos; -1 byte budget on malformed */
static Py_ssize_t h_skip_uws(H *h, Py_ssize_t pos)
{
    while (pos < h->n) {
        int cl, bad = 0;
        if (!u8_isspace_at(h->d, h->n, pos, &cl, &bad)) {
            if (bad)
                h->bail = 1;
            break;
        }
        pos += cl;
    }
    return pos;
}

/* (?:\s|/(?!>))* */
static Py_ssize_t h_skip_ws_slash(H *h, Py_ssize_t pos)
{
    while (pos < h->n) {
        if (h->d[pos] == '/') {
            if (pos + 1 < h->n && h->d[pos + 1] == '>')
                break;
            pos++;
            continue;
        }
        int cl, bad = 0;
        if (!u8_isspace_at(h->d, h->n, pos, &cl, &bad)) {
            if (bad)
                h->bail = 1;
            break;
        }
        pos += cl;
    }
    return pos;
}

/* lowercased ASCII str from a byte range; bails on non-ASCII (parity
 * with str.lower() would need unicode case mapping) */
static PyObject *h_lower_name(H *h, Py_ssize_t s, Py_ssize_t e)
{
    for (Py_ssize_t i = s; i < e; i++)
        if (h->d[i] >= 0x80) {
            h->bail = 1;
            return NULL;
        }
    char small[64];
    char *buf = (e - s) < (Py_ssize_t)sizeof(small)
                    ? small
                    : (char *)malloc((size_t)(e - s));
    if (!buf) {
        PyErr_NoMemory();
        return NULL;
    }
    for (Py_ssize_t i = s; i < e; i++) {
        char ch = (char)h->d[i];
        buf[i - s] = (ch >= 'A' && ch <= 'Z') ? ch + 32 : ch;
    }
    PyObject *r = PyUnicode_FromStringAndSize(buf, e - s);
    if (buf != small)
        free(buf);
    return r;
}

/* check_for_whole_start_tag: locatestarttagend_tolerant scan + the
 * branch ladder.  Returns endpos, or -1 (incomplete / bail set). */
static Py_ssize_t h_check_whole_start(H *h, Py_ssize_t i)
{
    const unsigned char *d = h->d;
    Py_ssize_t n = h->n;
    Py_ssize_t p = i + 2; /* '<' + leading alpha (caller verified) */
    while (p < n && h_namebyte(d[p]))
        p++;
    /* optional group: [\s/]* then attr-units (no gap between units —
     * each unit's own trailing run separates them) */
    for (;;) { /* [\s/]* */
        if (p >= n)
            break;
        if (d[p] == '/') {
            p++;
            continue;
        }
        int cl, bad = 0;
        if (!u8_isspace_at(d, n, p, &cl, &bad)) {
            if (bad) {
                h->bail = 1;
                return -1;
            }
            break;
        }
        p += cl;
    }
    for (;;) { /* attr units */
        if (p >= n)
            break;
        /* lookbehind (?<=['"\s/]) */
        Py_ssize_t ps = u8_char_start_before(d, p);
        int cl2;
        long pc = u8_char_at(d, n, ps, &cl2);
        if (pc < 0) {
            h->bail = 1;
            return -1;
        }
        if (!(pc == '\'' || pc == '"' || pc == '/' ||
              Py_UNICODE_ISSPACE((Py_UCS4)pc)))
            break;
        /* attr-name first char [^\s/>] */
        if (d[p] == '/' || d[p] == '>')
            break;
        {
            int cl, bad = 0;
            if (u8_isspace_at(d, n, p, &cl, &bad))
                break;
            if (bad) {
                h->bail = 1;
                return -1;
            }
            p += cl;
        }
        for (;;) { /* [^\s/=>]* */
            if (p >= n)
                break;
            unsigned char b = d[p];
            if (b == '/' || b == '=' || b == '>')
                break;
            int cl, bad = 0;
            if (u8_isspace_at(d, n, p, &cl, &bad))
                break;
            if (bad) {
                h->bail = 1;
                return -1;
            }
            p += cl;
        }
        /* optional (?:\s*=+\s* value \s*)? — with sre's backtracking on
         * an unterminated quote: give back one \s*₂ char (bare empty
         * value), else one '=' (bare value starting at '='), else the
         * whole group is empty */
        {
            Py_ssize_t q = p;
            Py_ssize_t e1 = h_skip_uws(h, q);
            if (h->bail)
                return -1;
            if (e1 < n && d[e1] == '=') {
                Py_ssize_t e2 = e1;
                while (e2 < n && d[e2] == '=')
                    e2++;
                Py_ssize_t e3 = h_skip_uws(h, e2);
                if (h->bail)
                    return -1;
                int okval = 1;
                Py_ssize_t v = e3;
                if (v < n && (d[v] == '\'' || d[v] == '"')) {
                    unsigned char qc = d[v];
                    const unsigned char *e = (const unsigned char *)memchr(
                        d + v + 1, qc, (size_t)(n - v - 1));
                    if (e)
                        v = (e - d) + 1;
                    else if (e3 > e2) {
                        /* bare empty value one \s char back */
                        v = u8_char_start_before(d, e3);
                    } else if (e2 - e1 >= 2) {
                        /* bare value from the last '=' */
                        v = e2 - 1;
                        while (v < n && d[v] != '>') {
                            int cl, bad = 0;
                            if (u8_isspace_at(d, n, v, &cl, &bad))
                                break;
                            if (bad) {
                                h->bail = 1;
                                return -1;
                            }
                            v += cl;
                        }
                    } else
                        okval = 0;
                } else { /* bare (?!['"])[^>\s]* — possibly empty */
                    while (v < n && d[v] != '>') {
                        int cl, bad = 0;
                        if (u8_isspace_at(d, n, v, &cl, &bad))
                            break;
                        if (bad) {
                            h->bail = 1;
                            return -1;
                        }
                        v += cl;
                    }
                }
                if (okval) {
                    v = h_skip_uws(h, v); /* \s* inside the group */
                    if (h->bail)
                        return -1;
                    p = v;
                }
                /* !okval: the whole optional group matches empty; p = q */
            }
        }
        p = h_skip_ws_slash(h, p); /* unit trailing */
        if (h->bail)
            return -1;
    }
    Py_ssize_t j = h_skip_uws(h, p); /* final \s* */
    if (h->bail)
        return -1;
    if (j < n && d[j] == '>')
        return j + 1;
    if (j < n && d[j] == '/') {
        if (j + 1 < n && d[j + 1] == '>')
            return j + 2;
        return -1; /* lone '/': buffer boundary */
    }
    if (j >= n)
        return -1; /* end of input */
    {
        unsigned char nb = d[j];
        if ((nb >= 'a' && nb <= 'z') || (nb >= 'A' && nb <= 'Z') ||
            nb == '=' || nb == '/')
            return -1; /* end of input in or before attribute value */
    }
    if (j > i)
        return j;
    return i + 1;
}

/* str.strip() of a byte range equal to ">" or "/>" ? 0 no, 1 ">", 2 "/>" */
static int h_stripped_end(H *h, Py_ssize_t s, Py_ssize_t e)
{
    while (s < e) {
        int cl, bad = 0;
        if (!u8_isspace_at(h->d, h->n > e ? e : h->n, s, &cl, &bad)) {
            if (bad) {
                h->bail = 1;
                return -1;
            }
            break;
        }
        s += cl;
    }
    while (e > s) {
        Py_ssize_t cs = u8_char_start_before(h->d, e);
        int cl, bad = 0;
        if (!u8_isspace_at(h->d, h->n, cs, &cl, &bad)) {
            if (bad) {
                h->bail = 1;
                return -1;
            }
            break;
        }
        e = cs;
    }
    if (e - s == 1 && h->d[s] == '>')
        return 1;
    if (e - s == 2 && h->d[s] == '/' && h->d[s + 1] == '>')
        return 2;
    return 0;
}

/* parse_starttag(i): returns endpos or -1 (incomplete/bail/error).
 * Real Python exceptions leave an error set with return -1 and h->bail
 * unset — callers must distinguish. */
static Py_ssize_t h_parse_starttag(H *h, Py_ssize_t i)
{
    const unsigned char *d = h->d;
    Py_ssize_t n = h->n;
    Py_ssize_t endpos = h_check_whole_start(h, i);
    if (endpos < 0)
        return -1;
    /* tagfind_tolerant at i+1 */
    Py_ssize_t name_s = i + 1;
    Py_ssize_t k = name_s + 1;
    while (k < n && h_namebyte(d[k]))
        k++;
    PyObject *tag = h_lower_name(h, name_s, k);
    if (!tag)
        return -1;
    k = h_skip_ws_slash(h, k);
    if (h->bail) {
        Py_DECREF(tag);
        return -1;
    }
    PyObject *src = NULL, *href = NULL;
    int hint = 0;
    int failed = 0;
    while (k < endpos) {
        /* attrfind_tolerant.match(rawdata, k) */
        Py_ssize_t ps = u8_char_start_before(d, k);
        int cl0;
        long pc = u8_char_at(d, n, ps, &cl0);
        if (pc < 0) {
            h->bail = 1;
            failed = 1;
            break;
        }
        if (!(pc == '\'' || pc == '"' || pc == '/' ||
              Py_UNICODE_ISSPACE((Py_UCS4)pc)))
            break;
        if (k >= n)
            break;
        Py_ssize_t an_s = k;
        {
            int cl, bad = 0;
            if (d[k] == '/' || d[k] == '>')
                break;
            if (u8_isspace_at(d, n, k, &cl, &bad))
                break;
            if (bad) {
                h->bail = 1;
                failed = 1;
                break;
            }
            k += cl;
        }
        while (k < n) {
            unsigned char b = d[k];
            if (b == '/' || b == '=' || b == '>')
                break;
            int cl, bad = 0;
            if (u8_isspace_at(h->d, n, k, &cl, &bad))
                break;
            if (bad) {
                h->bail = 1;
                failed = 1;
                break;
            }
            k += cl;
        }
        if (failed)
            break;
        Py_ssize_t an_e = k;
        /* optional value: (\s*=+\s*('[^']*'|"[^"]*"|(?!['"])[^>\s]*))? */
        Py_ssize_t val_s = -1, val_e = -1;
        int has_rest = 0, quoted = 0;
        {
            Py_ssize_t e1 = h_skip_uws(h, k);
            if (h->bail) {
                failed = 1;
                break;
            }
            if (e1 < n && d[e1] == '=') {
                Py_ssize_t e2 = e1;
                while (e2 < n && d[e2] == '=')
                    e2++;
                Py_ssize_t e3 = h_skip_uws(h, e2);
                if (h->bail) {
                    failed = 1;
                    break;
                }
                int okval = 1;
                Py_ssize_t v = e3, ve = e3;
                int bare_from = -1;
                if (v < n && (d[v] == '\'' || d[v] == '"')) {
                    unsigned char qch = d[v];
                    const unsigned char *e = (const unsigned char *)memchr(
                        d + v + 1, qch, (size_t)(n - v - 1));
                    if (e) {
                        quoted = 1;
                        val_s = v + 1;
                        val_e = (e - d);
                        ve = val_e + 1;
                    } else if (e3 > e2) {
                        /* sre backtrack: give back one \s char → bare
                         * empty value */
                        Py_ssize_t bp = u8_char_start_before(d, e3);
                        val_s = bp;
                        val_e = bp;
                        ve = bp;
                    } else if (e2 - e1 >= 2) {
                        /* give back one '=' → bare value from it */
                        bare_from = (int)1;
                        v = e2 - 1;
                        val_s = v;
                        while (v < n && d[v] != '>') {
                            int cl, bad = 0;
                            if (u8_isspace_at(d, n, v, &cl, &bad))
                                break;
                            if (bad) {
                                h->bail = 1;
                                failed = 1;
                                break;
                            }
                            v += cl;
                        }
                        if (failed)
                            break;
                        val_e = v;
                        ve = v;
                    } else
                        okval = 0;
                } else {
                    val_s = v;
                    while (v < n && d[v] != '>') {
                        int cl, bad = 0;
                        if (u8_isspace_at(d, n, v, &cl, &bad))
                            break;
                        if (bad) {
                            h->bail = 1;
                            failed = 1;
                            break;
                        }
                        v += cl;
                    }
                    if (failed)
                        break;
                    val_e = v;
                    ve = v;
                }
                (void)bare_from;
                if (okval) {
                    has_rest = 1;
                    k = ve;
                }
                /* !okval: group empty; k stays at name end */
            }
        }
        if (failed)
            break;
        k = h_skip_ws_slash(h, k);
        if (h->bail) {
            failed = 1;
            break;
        }
        /* materialize: name lower, value (None if no rest) */
        PyObject *aname = h_lower_name(h, an_s, an_e);
        if (!aname) {
            failed = 1;
            break;
        }
        PyObject *aval = NULL; /* NULL == None */
        if (has_rest) {
            /* attrvalue possibly empty; unescape non-empty values */
            if (val_e > val_s) {
                aval = h_chunk(h, val_s, val_e, 1);
                if (!aval) {
                    Py_DECREF(aname);
                    failed = 1;
                    break;
                }
            } else {
                aval = Py_NewRef(g_empty);
            }
        }
        (void)quoted;
        const char *ans = PyUnicode_AsUTF8(aname);
        if (!ans) {
            Py_DECREF(aname);
            Py_XDECREF(aval);
            failed = 1;
            break;
        }
        if (strcmp(ans, "src") == 0) {
            Py_XDECREF(src);
            src = aval ? Py_NewRef(aval) : NULL;
        } else if (strcmp(ans, "href") == 0) {
            Py_XDECREF(href);
            href = aval ? Py_NewRef(aval) : NULL;
        } else if (!hint && aval && PyUnicode_GET_LENGTH(aval) &&
                   (strcmp(ans, "class") == 0 || strcmp(ans, "id") == 0 ||
                    strcmp(ans, "role") == 0)) {
            hint = h_hint_match(h, aval);
            if (hint < 0) {
                Py_DECREF(aname);
                Py_XDECREF(aval);
                failed = 1;
                break;
            }
        }
        Py_DECREF(aname);
        Py_XDECREF(aval);
    }
    if (failed) {
        Py_DECREF(tag);
        Py_XDECREF(src);
        Py_XDECREF(href);
        return -1;
    }
    int endkind = h_stripped_end(h, k, endpos);
    if (endkind < 0) {
        Py_DECREF(tag);
        Py_XDECREF(src);
        Py_XDECREF(href);
        return -1;
    }
    int rc = 0;
    if (endkind == 0) {
        /* junk between attrs and '>': the whole tag text becomes data
         * (raw, no unescape — parser.py:330) */
        rc = h_data_range(h, i, endpos, 0);
    } else if (endkind == 2) {
        rc = h_start(h, tag, src, href, hint);
        if (rc == 0) {
            int v = h_in_set(tag, H_VOID);
            if (v < 0)
                rc = -1;
            else if (!v)
                rc = h_endtag(h, tag);
        }
    } else {
        rc = h_start(h, tag, src, href, hint);
        if (rc == 0) {
            const char *t = PyUnicode_AsUTF8(tag);
            if (!t)
                rc = -1;
            else if (strcmp(t, "script") == 0 || strcmp(t, "style") == 0) {
                Py_XDECREF(h->cdata);
                h->cdata = Py_NewRef(tag);
            }
        }
    }
    Py_DECREF(tag);
    Py_XDECREF(src);
    Py_XDECREF(href);
    return rc < 0 ? -1 : endpos;
}

/* parse_endtag(i) */
static Py_ssize_t h_parse_endtag(H *h, Py_ssize_t i)
{
    const unsigned char *d = h->d;
    Py_ssize_t n = h->n;
    const unsigned char *gt = (const unsigned char *)memchr(
        d + i + 1, '>', (size_t)(n - i - 1));
    if (!gt)
        return -1;
    Py_ssize_t gtpos = (gt - d) + 1;
    /* endtagfind.match: </ \s* [a-zA-Z][-.a-zA-Z0-9:_]* \s* > */
    Py_ssize_t p = h_skip_uws(h, i + 2);
    if (h->bail)
        return -1;
    Py_ssize_t ts = -1, te = -1;
    int full = 0;
    if (p < n && ((d[p] >= 'a' && d[p] <= 'z') ||
                  (d[p] >= 'A' && d[p] <= 'Z'))) {
        ts = p;
        p++;
        while (p < n) {
            unsigned char b = d[p];
            if ((b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') ||
                (b >= '0' && b <= '9') || b == '-' || b == '.' ||
                b == ':' || b == '_')
                p++;
            else
                break;
        }
        te = p;
        Py_ssize_t p2 = h_skip_uws(h, p);
        if (h->bail)
            return -1;
        if (p2 < n && d[p2] == '>')
            full = 1;
    }
    if (!full) {
        if (h->cdata) {
            if (h_data_range(h, i, gtpos, 0) < 0)
                return -1;
            return gtpos;
        }
        /* tagfind_tolerant at i+2 */
        if (i + 2 < n && ((d[i + 2] >= 'a' && d[i + 2] <= 'z') ||
                          (d[i + 2] >= 'A' && d[i + 2] <= 'Z'))) {
            Py_ssize_t ns = i + 2, ne = ns + 1;
            while (ne < n && h_namebyte(d[ne]))
                ne++;
            PyObject *tag = h_lower_name(h, ns, ne);
            if (!tag)
                return -1;
            Py_ssize_t after = h_skip_ws_slash(h, ne);
            if (h->bail) {
                Py_DECREF(tag);
                return -1;
            }
            const unsigned char *g2 = (const unsigned char *)memchr(
                d + after, '>', (size_t)(n - after));
            if (!g2) {
                /* unreachable (endendtag found one past the name), but
                 * bail defensively rather than mirror gtpos=-1+1=0 */
                Py_DECREF(tag);
                h->bail = 1;
                return -1;
            }
            int rc = h_endtag(h, tag);
            Py_DECREF(tag);
            if (rc < 0)
                return -1;
            return (g2 - d) + 1;
        }
        if (i + 3 <= n && d[i] == '<' && d[i + 1] == '/' &&
            i + 2 < n && d[i + 2] == '>')
            return i + 3;
        /* parse_bogus_comment(i): '>' from i+2 */
        {
            const unsigned char *g3 = (const unsigned char *)memchr(
                d + i + 2, '>', (size_t)(n - i - 2));
            if (!g3)
                return -1;
            return (g3 - d) + 1;
        }
    }
    {
        PyObject *elem = h_lower_name(h, ts, te);
        if (!elem)
            return -1;
        if (h->cdata) {
            int eq = PyUnicode_Compare(elem, h->cdata);
            if (eq == -1 && PyErr_Occurred()) {
                Py_DECREF(elem);
                return -1;
            }
            if (eq != 0) {
                Py_DECREF(elem);
                if (h_data_range(h, i, gtpos, 0) < 0)
                    return -1;
                return gtpos;
            }
        }
        int rc = h_endtag(h, elem);
        Py_DECREF(elem);
        if (rc < 0)
            return -1;
        Py_CLEAR(h->cdata);
        return gtpos;
    }
}

/* parse_comment: '<!--' … '--\s*>' */
static Py_ssize_t h_parse_comment(H *h, Py_ssize_t i)
{
    const unsigned char *d = h->d;
    Py_ssize_t n = h->n;
    Py_ssize_t p = i + 4;
    for (;;) {
        const unsigned char *dd = h_find2(d + p, (size_t)(n - p), '-', '-');
        if (!dd)
            return -1;
        Py_ssize_t q = (dd - d) + 2;
        Py_ssize_t q2 = h_skip_uws(h, q);
        if (h->bail)
            return -1;
        if (q2 < n && d[q2] == '>')
            return q2 + 1;
        p = (dd - d) + 1;
        if (p + 2 > n)
            return -1;
    }
}

/* the cdata 'interesting' search: </\s*elem\s*> (re.I) from i; returns
 * match START or -1 */
static Py_ssize_t h_cdata_search(H *h, Py_ssize_t i)
{
    const unsigned char *d = h->d;
    Py_ssize_t n = h->n;
    const char *elem = PyUnicode_AsUTF8(h->cdata);
    if (!elem)
        return -2;
    size_t el = strlen(elem);
    Py_ssize_t p = i;
    for (;;) {
        const unsigned char *lt = (const unsigned char *)memchr(
            d + p, '<', (size_t)(n - p));
        if (!lt)
            return -1;
        Py_ssize_t s = lt - d;
        Py_ssize_t q = s + 1;
        if (q < n && d[q] == '/') {
            q = h_skip_uws(h, q + 1);
            if (h->bail)
                return -2;
            if (q + (Py_ssize_t)el <= n) {
                int ok = 1;
                for (size_t m = 0; m < el; m++) {
                    unsigned char b = d[q + (Py_ssize_t)m];
                    if (b >= 'A' && b <= 'Z')
                        b += 32;
                    if (b != (unsigned char)elem[m]) {
                        ok = 0;
                        break;
                    }
                }
                if (ok) {
                    Py_ssize_t r = h_skip_uws(h, q + (Py_ssize_t)el);
                    if (h->bail)
                        return -2;
                    if (r < n && d[r] == '>')
                        return s;
                }
            }
        }
        p = s + 1;
    }
}

/* goahead(end) from *ppos; advances *ppos to the consumed prefix.
 * Returns 0 ok (h->bail may be set), -1 on real error. */
static int h_goahead(H *h, Py_ssize_t *ppos, int end)
{
    const unsigned char *d = h->d;
    Py_ssize_t n = h->n;
    Py_ssize_t i = *ppos;
    while (i < n && !h->bail) {
        Py_ssize_t j;
        if (!h->cdata) {
            const unsigned char *lt = (const unsigned char *)memchr(
                d + i, '<', (size_t)(n - i));
            if (!lt) {
                /* trailing text: hold back if a charref may be cut */
                Py_ssize_t lo = i > n - 34 ? i : n - 34;
                Py_ssize_t amppos = -1;
                for (Py_ssize_t a = n - 1; a >= lo; a--)
                    if (d[a] == '&') {
                        amppos = a;
                        break;
                    }
                if (amppos >= 0) {
                    /* re [\s;].search from amppos */
                    int found = 0;
                    Py_ssize_t a = amppos;
                    while (a < n) {
                        if (d[a] == ';') {
                            found = 1;
                            break;
                        }
                        int cl, bad = 0;
                        if (u8_isspace_at(d, n, a, &cl, &bad)) {
                            found = 1;
                            break;
                        }
                        if (bad) {
                            h->bail = 1;
                            break;
                        }
                        a += cl;
                    }
                    if (h->bail)
                        break;
                    if (!found)
                        break; /* wait till we get all the text */
                }
                j = n;
            } else
                j = lt - d;
        } else {
            Py_ssize_t m = h_cdata_search(h, i);
            if (m == -2)
                return h->bail ? 0 : -1;
            if (m < 0)
                break; /* unterminated cdata: tail stays unflushed */
            j = m;
        }
        if (i < j) {
            if (h_data_range(h, i, j, h->cdata ? 0 : 1) < 0)
                return h->bail ? 0 : -1;
        }
        i = j;
        if (i == n)
            break;
        /* d[i] == '<' */
        Py_ssize_t k;
        unsigned char nx = i + 1 < n ? d[i + 1] : 0;
        if ((nx >= 'a' && nx <= 'z') || (nx >= 'A' && nx <= 'Z')) {
            k = h_parse_starttag(h, i);
            if (k < 0 && PyErr_Occurred())
                return -1;
            if (h->bail)
                break;
        } else if (nx == '/') {
            k = h_parse_endtag(h, i);
            if (k < 0 && PyErr_Occurred())
                return -1;
            if (h->bail)
                break;
        } else if (i + 3 < n && nx == '!' && d[i + 2] == '-' &&
                   d[i + 3] == '-') {
            k = h_parse_comment(h, i);
            if (h->bail)
                break;
        } else if (nx == '?') {
            const unsigned char *g = (const unsigned char *)memchr(
                d + i + 2, '>', (size_t)(n - i - 2));
            k = g ? (g - d) + 1 : -1;
        } else if (nx == '!') {
            /* parse_html_declaration ('<!--' handled above) */
            if (i + 2 < n && d[i + 2] == '[') {
                h->bail = 1; /* marked section: rare, Python authority */
                break;
            }
            if (i + 9 <= n && strncasecmp((const char *)d + i, "<!doctype",
                                          9) == 0) {
                const unsigned char *g = (const unsigned char *)memchr(
                    d + i + 9, '>', (size_t)(n - i - 9));
                k = g ? (g - d) + 1 : -1;
            } else {
                /* bogus comment */
                const unsigned char *g = (const unsigned char *)memchr(
                    d + i + 2, '>', (size_t)(n - i - 2));
                k = g ? (g - d) + 1 : -1;
            }
        } else if (i + 1 < n) {
            if (h_data(h, g_lt_str) < 0)
                return -1;
            k = i + 1;
        } else if (end) {
            if (h_data(h, g_lt_str) < 0)
                return -1;
            k = i + 1;
        } else
            break;
        if (h->bail)
            break;
        if (k < 0) {
            if (!end)
                break;
            const unsigned char *g = (const unsigned char *)memchr(
                d + i + 1, '>', (size_t)(n - i - 1));
            if (g)
                k = (g - d) + 1;
            else {
                const unsigned char *lt2 = (const unsigned char *)memchr(
                    d + i + 1, '<', (size_t)(n - i - 1));
                k = lt2 ? (lt2 - d) : i + 1;
            }
            if (h_data_range(h, i, k, h->cdata ? 0 : 1) < 0)
                return h->bail ? 0 : -1;
        }
        i = k;
    }
    if (!h->bail && end && i < n && !h->cdata) {
        if (h_data_range(h, i, n, 1) < 0)
            return h->bail ? 0 : -1;
        i = n;
    }
    *ppos = i;
    return 0;
}

static void h_free(H *h)
{
    for (Py_ssize_t i = 0; i < h->sp; i++)
        Py_DECREF(h->stack[i].tag);
    free(h->stack);
    Py_XDECREF(h->seg);
    Py_XDECREF(h->events);
    Py_XDECREF(h->links);
    Py_XDECREF(h->anchors);
    Py_XDECREF(h->cdata);
}

/* html_events(doc) -> (events, links) | None (bail: caller re-parses
 * with the pure-Python authority) */
static PyObject *html_events_py(PyObject *self, PyObject *args)
{
    PyObject *doc;
    if (!PyArg_ParseTuple(args, "U", &doc))
        return NULL;
    if (!g_unescape) {
        PyErr_SetString(PyExc_RuntimeError,
                        "html path requires setup_html");
        return NULL;
    }
    Py_ssize_t n;
    const char *u8 = PyUnicode_AsUTF8AndSize(doc, &n);
    if (!u8) {
        PyErr_Clear(); /* lone surrogates etc: Python authority */
        Py_RETURN_NONE;
    }
    H h;
    memset(&h, 0, sizeof(h));
    h.d = (const unsigned char *)u8;
    h.n = n;
    h.seg = PyList_New(0);
    h.events = PyList_New(0);
    h.links = PyList_New(0);
    h.anchors = PyList_New(0);
    if (!h.seg || !h.events || !h.links || !h.anchors) {
        h_free(&h);
        return NULL;
    }
    Py_ssize_t pos = 0;
    /* feed(whole doc) then close(): goahead(0) then goahead(1) over the
     * unconsumed tail (parser.py feed/close semantics) */
    if (h_goahead(&h, &pos, 0) < 0) {
        h_free(&h);
        return NULL;
    }
    if (!h.bail && h_goahead(&h, &pos, 1) < 0) {
        h_free(&h);
        return NULL;
    }
    if (h.bail) {
        h_free(&h);
        Py_RETURN_NONE;
    }
    /* consumer close(): final flush */
    if (h_flush(&h) < 0) {
        h_free(&h);
        return NULL;
    }
    PyObject *r = PyTuple_Pack(2, h.events, h.links);
    h_free(&h);
    return r;
}

/* ========================================================================
 * Traditional xref-section fast parse (xref.py _parse_traditional_section
 * entry loop; xref.rs:750-911 lineage).  STRICT 20-byte-stride layout
 * only — `NNNNNNNNNN GGGGG k\x??\x??` — anything else (flexible spacing,
 * comments before 'xref', truncated tables, 19-byte entries) returns
 * None and the Python loop, which is the behavior authority including
 * its flexible-producer fallback, re-parses from the same offset.
 * ======================================================================== */

static PyObject *g_n_str, *g_f_str; /* "n" / "f" singletons */

/* bytes-pattern \s (ASCII-only: [ \t\n\r\f\v]) */
static int is_bws(unsigned char b)
{
    return b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == 0x0c ||
           b == 0x0b;
}

static PyObject *parse_xref_sections(PyObject *self, PyObject *args)
{
    PyObject *data_obj;
    Py_ssize_t offset;
    if (!PyArg_ParseTuple(args, "On", &data_obj, &offset))
        return NULL;
    if (!PyBytes_Check(data_obj) || offset < 0)
        Py_RETURN_NONE;
    const unsigned char *d = (const unsigned char *)PyBytes_AS_STRING(data_obj);
    Py_ssize_t n = PyBytes_GET_SIZE(data_obj);
    Py_ssize_t p = offset;
    /* the Lexer skips ws AND comments before 'xref'; handle pure-ws skip
     * natively, bail on anything else (incl. '%') */
    while (p < n && is_ws1(d[p]))
        p++;
    if (p + 4 > n || memcmp(d + p, "xref", 4) != 0)
        Py_RETURN_NONE; /* Python raises its exact XRefError */
    if (p + 4 < n && !is_bound(d[p + 4]))
        Py_RETURN_NONE; /* 'xrefx' — not the keyword token */
    p += 4;

    PyObject *entries = PyDict_New();
    if (!entries)
        return NULL;
    for (;;) {
        /* subsection header: \s*(\d+)\s+(\d+)\s* — commit p only on a
         * full match (regex semantics) */
        Py_ssize_t q = p;
        while (q < n && is_bws(d[q]))
            q++;
        if (q >= n || d[q] < '0' || d[q] > '9')
            break; /* no further subsection; p unchanged */
        Py_ssize_t s1 = q;
        while (q < n && d[q] >= '0' && d[q] <= '9')
            q++;
        if (q - s1 > 18)
            goto bail;
        Py_ssize_t ws = q;
        while (q < n && is_bws(d[q]))
            q++;
        if (q == ws || q >= n || d[q] < '0' || d[q] > '9')
            break; /* header doesn't match; p unchanged */
        Py_ssize_t s2 = q;
        while (q < n && d[q] >= '0' && d[q] <= '9')
            q++;
        if (q - s2 > 18)
            goto bail;
        while (q < n && is_bws(d[q]))
            q++;
        long long start_obj = 0, count = 0;
        for (Py_ssize_t i = s1; d[i] >= '0' && d[i] <= '9'; i++)
            start_obj = start_obj * 10 + (d[i] - '0');
        for (Py_ssize_t i = s2; d[i] >= '0' && d[i] <= '9'; i++)
            count = count * 10 + (d[i] - '0');
        Py_ssize_t hdr_end = q;
        /* strict stride validation */
        if (count > 0) {
            if (hdr_end + 20 * (count - 1) + 18 > n)
                goto bail; /* truncated: Python's flex path decides */
            for (long long i = 0; i < count; i++) {
                const unsigned char *e = d + hdr_end + 20 * i;
                for (int k2 = 0; k2 < 10; k2++)
                    if (e[k2] < '0' || e[k2] > '9')
                        goto bail;
                if (!is_bws(e[10]))
                    goto bail;
                for (int k2 = 11; k2 < 16; k2++)
                    if (e[k2] < '0' || e[k2] > '9')
                        goto bail;
                if (!is_bws(e[16]))
                    goto bail;
                if (e[17] != 'n' && e[17] != 'f')
                    goto bail;
                if (i < count - 1) {
                    /* the two stride filler bytes must be whitespace or
                     * the bulk regex would see a different layout */
                    if (!is_bws(e[18]) || !is_bws(e[19]))
                        goto bail;
                }
            }
            for (long long i = 0; i < count; i++) {
                const unsigned char *e = d + hdr_end + 20 * i;
                long long off = 0, gen = 0;
                for (int k2 = 0; k2 < 10; k2++)
                    off = off * 10 + (e[k2] - '0');
                for (int k2 = 11; k2 < 16; k2++)
                    gen = gen * 10 + (e[k2] - '0');
                PyObject *num = PyLong_FromLongLong(start_obj + i);
                if (!num)
                    goto err;
                PyObject *off_o = PyLong_FromLongLong(off);
                PyObject *gen_o = PyLong_FromLongLong(gen);
                if (!off_o || !gen_o) {
                    Py_DECREF(num);
                    Py_XDECREF(off_o);
                    Py_XDECREF(gen_o);
                    goto err;
                }
                PyObject *tup = PyTuple_Pack(
                    3, e[17] == 'n' ? g_n_str : g_f_str, off_o, gen_o);
                Py_DECREF(off_o);
                Py_DECREF(gen_o);
                if (!tup) {
                    Py_DECREF(num);
                    goto err;
                }
                /* first definition wins (entries.setdefault) */
                PyObject *prev = PyDict_SetDefault(entries, num, tup);
                Py_DECREF(num);
                Py_DECREF(tup);
                if (!prev)
                    goto err;
            }
            p = hdr_end + 20 * (count - 1) + 18;
        } else {
            p = hdr_end;
        }
        /* trailing-EOL skip after the final entry: [\r\n ] ONLY */
        while (p < n && (d[p] == '\r' || d[p] == '\n' || d[p] == ' '))
            p++;
    }
    {
        PyObject *r = Py_BuildValue("(On)", entries, p);
        Py_DECREF(entries);
        return r;
    }
bail:
    Py_DECREF(entries);
    Py_RETURN_NONE;
err:
    Py_DECREF(entries);
    return NULL;
}

static void install_global(PyObject **slot, PyObject *value); /* below */

static PyObject *setup_html(PyObject *self, PyObject *args)
{
    PyObject *unescape, *ws_collapse, *boiler_value;
    if (!PyArg_ParseTuple(args, "OOO", &unescape, &ws_collapse,
                          &boiler_value))
        return NULL;
    install_global(&g_unescape, unescape);
    install_global(&g_ws_collapse, ws_collapse);
    install_global(&g_boiler_value, boiler_value);
    Py_RETURN_NONE;
}

/* ---- setup -------------------------------------------------------------- */
/* Replace a module global: incref the new value, release the previously
 * installed one (setup may be called more than once if content.py is
 * imported under two module identities, e.g. a zip deployment). */
static void install_global(PyObject **slot, PyObject *value)
{
    Py_INCREF(value);
    Py_XDECREF(*slot);
    *slot = value;
}

static PyObject *setup(PyObject *self, PyObject *args)
{
    PyObject *markers, *name_memo, *decode_name, *inline_tok, *hexval,
        *bi_helper, *bdc_helper;
    if (!PyArg_ParseTuple(args, "OOOOOOO", &markers, &name_memo,
                          &decode_name, &inline_tok, &hexval,
                          &bi_helper, &bdc_helper))
        return NULL;
    if (!PyTuple_Check(markers) || PyTuple_GET_SIZE(markers) != 4) {
        PyErr_SetString(PyExc_TypeError, "markers must be a 4-tuple");
        return NULL;
    }
    install_global(&g_AO, PyTuple_GET_ITEM(markers, 0));
    install_global(&g_AC, PyTuple_GET_ITEM(markers, 1));
    install_global(&g_DO, PyTuple_GET_ITEM(markers, 2));
    install_global(&g_DC, PyTuple_GET_ITEM(markers, 3));
    install_global(&g_name_memo, name_memo);
    install_global(&g_decode_name, decode_name);
    install_global(&g_inline_tok, inline_tok);
    install_global(&g_hexval, hexval);
    install_global(&g_bi_helper, bi_helper);
    install_global(&g_bdc_helper, bdc_helper);
    Py_RETURN_NONE;
}

static PyObject *setup_obj(PyObject *self, PyObject *args)
{
    PyObject *ref_cls, *obj_name_memo, *decode_name_obj;
    if (!PyArg_ParseTuple(args, "OOO", &ref_cls, &obj_name_memo,
                          &decode_name_obj))
        return NULL;
    install_global(&g_ref_cls, ref_cls);
    install_global(&g_obj_name_memo, obj_name_memo);
    install_global(&g_decode_name_obj, decode_name_obj);
    Py_RETURN_NONE;
}

static PyObject *setup_layout(PyObject *self, PyObject *args)
{
    PyObject *frag_cls, *font_style, *frag_env;
    if (!PyArg_ParseTuple(args, "OOO", &frag_cls, &font_style, &frag_env))
        return NULL;
    install_global(&g_frag_cls, frag_cls);
    install_global(&g_font_style, font_style);
    install_global(&g_frag_env, frag_env);
    Py_RETURN_NONE;
}

/* ---- merge_close: C transcription of LayoutProcessor.merge_close_fragments
 * (layout.py, extraction.rs:1598-1669 lineage).  Kerning-artifact merge:
 * a linear pass over emission-ordered fragments gluing runs on the same
 * baseline with sub-half-space gaps.  Fast path requires every element
 * to be a CFrag (the C interpreter's output) — anything else returns
 * None and the caller runs the pure-Python authority.  The per-fragment
 * space-gap threshold is delegated to the Python callable (it reads the
 * page's font metrics) with a last-(font,size) memo — consecutive
 * fragments almost always share a font. */
static PyObject *merge_close(PyObject *self, PyObject *args)
{
    PyObject *list, *gap_cb;
    int reconstruct;
    if (!PyArg_ParseTuple(args, "OpO", &list, &reconstruct, &gap_cb))
        return NULL;
    if (!PyList_Check(list))
        Py_RETURN_NONE;
    Py_ssize_t n = PyList_GET_SIZE(list);
    PyObject *out = PyList_New(0);
    if (!out)
        return NULL;
    if (n == 0)
        return out;
    for (Py_ssize_t i = 0; i < n; i++)
        if (Py_TYPE(PyList_GET_ITEM(list, i)) != &CFragType) {
            Py_DECREF(out);
            Py_RETURN_NONE; /* bail: pure-Python fragments */
        }

    PyObject *pieces = PyList_New(0); /* current segment's text runs */
    if (!pieces) {
        Py_DECREF(out);
        return NULL;
    }
    CFrag *head = (CFrag *)PyList_GET_ITEM(list, 0);
    if (PyList_Append(pieces, head->text) < 0)
        goto fail;
    double cx = head->x, cy = head->y, cw = head->width;
    double cfs = head->font_size;
    /* last-(font_name identity, font_size) gap-threshold memo */
    PyObject *memo_fn = NULL;
    double memo_fs = 0.0, memo_thr = 0.0;
    int memo_ok = 0;

    for (Py_ssize_t i = 1; i < n; i++) {
        CFrag *f = (CFrag *)PyList_GET_ITEM(list, i);
        double y_diff = fabs(cy - f->y);
        double x_gap = f->x - (cx + cw);
        double y_tol;
        if (reconstruct) {
            double base =
                0.5 * (cfs < f->font_size ? cfs : f->font_size);
            y_tol = base > 0.0 ? base : 1.0;
        } else
            y_tol = 1.0;
        int should_merge = 0;
        if (y_diff < y_tol && x_gap >= 0.0 &&
            x_gap < f->font_size * 0.5) {
            int eq = PyObject_RichCompareBool(head->mcid, f->mcid, Py_EQ);
            if (eq < 0)
                goto fail;
            should_merge = eq;
        }
        if (should_merge) {
            double thr;
            if (memo_ok && memo_fn == f->font_name &&
                memo_fs == f->font_size) {
                thr = memo_thr;
            } else {
                PyObject *r = PyObject_CallOneArg(gap_cb, (PyObject *)f);
                if (!r)
                    goto fail;
                thr = PyFloat_AsDouble(r);
                Py_DECREF(r);
                if (thr == -1.0 && PyErr_Occurred())
                    goto fail;
                memo_fn = f->font_name;
                memo_fs = f->font_size;
                memo_thr = thr;
                memo_ok = 1;
            }
            if (x_gap > thr) {
                if (PyList_Append(pieces, g_sp) < 0)
                    goto fail;
            }
            if (PyList_Append(pieces, f->text) < 0)
                goto fail;
            cw = (f->x + f->width) - cx;
        } else {
            /* flush the segment as one merged fragment */
            CFrag *m = cfrag_alloc();
            if (!m)
                goto fail;
            PyObject *txt;
            if (PyList_GET_SIZE(pieces) == 1) {
                txt = PyList_GET_ITEM(pieces, 0);
                Py_INCREF(txt);
            } else {
                txt = PyUnicode_Join(g_empty, pieces);
                if (!txt) {
                    Py_DECREF(m);
                    goto fail;
                }
            }
            m->text = txt;
            Py_XINCREF(head->font_name);
            Py_XINCREF(head->color);
            Py_XINCREF(head->mcid);
            Py_XINCREF(head->struct_tag);
            m->font_name = head->font_name;
            m->color = head->color;
            m->mcid = head->mcid;
            m->struct_tag = head->struct_tag;
            m->x = cx;
            m->y = cy;
            m->width = cw;
            m->height = head->height;
            m->font_size = head->font_size;
            m->is_bold = head->is_bold;
            m->is_italic = head->is_italic;
            int rc = PyList_Append(out, (PyObject *)m);
            Py_DECREF(m);
            if (rc < 0)
                goto fail;
            head = f;
            if (PyList_SetSlice(pieces, 0, PyList_GET_SIZE(pieces), NULL) < 0)
                goto fail;
            if (PyList_Append(pieces, f->text) < 0)
                goto fail;
            cx = f->x;
            cy = f->y;
            cw = f->width;
            cfs = f->font_size;
        }
    }
    {
        CFrag *m = cfrag_alloc();
        if (!m)
            goto fail;
        PyObject *txt;
        if (PyList_GET_SIZE(pieces) == 1) {
            txt = PyList_GET_ITEM(pieces, 0);
            Py_INCREF(txt);
        } else {
            txt = PyUnicode_Join(g_empty, pieces);
            if (!txt) {
                Py_DECREF(m);
                goto fail;
            }
        }
        m->text = txt;
        Py_XINCREF(head->font_name);
        Py_XINCREF(head->color);
        Py_XINCREF(head->mcid);
        Py_XINCREF(head->struct_tag);
        m->font_name = head->font_name;
        m->color = head->color;
        m->mcid = head->mcid;
        m->struct_tag = head->struct_tag;
        m->x = cx;
        m->y = cy;
        m->width = cw;
        m->height = head->height;
        m->font_size = head->font_size;
        m->is_bold = head->is_bold;
        m->is_italic = head->is_italic;
        int rc = PyList_Append(out, (PyObject *)m);
        Py_DECREF(m);
        if (rc < 0)
            goto fail;
    }
    Py_DECREF(pieces);
    return out;
fail:
    Py_DECREF(pieces);
    Py_DECREF(out);
    return NULL;
}

/* ---- reconstruct_text: C transcription of the post-merge text rebuild
 * (LayoutProcessor.reconstruct_text_from_fragments' loop body,
 * extraction.rs:1558-1596).  Takes the ALREADY-MERGED fragment list;
 * bails (None) on any non-CFrag element. */
static PyObject *reconstruct_text(PyObject *self, PyObject *args)
{
    PyObject *list;
    double nl_thr, sp_thr;
    int merge_hyph;
    if (!PyArg_ParseTuple(args, "Oddp", &list, &nl_thr, &sp_thr,
                          &merge_hyph))
        return NULL;
    if (!PyList_Check(list))
        Py_RETURN_NONE;
    Py_ssize_t n = PyList_GET_SIZE(list);
    for (Py_ssize_t i = 0; i < n; i++)
        if (Py_TYPE(PyList_GET_ITEM(list, i)) != &CFragType)
            Py_RETURN_NONE;
    PyObject *parts = PyList_New(0);
    if (!parts)
        return NULL;
    double last_y = INFINITY, last_x = 0.0;
    int last_hyphen = 0;
    for (Py_ssize_t i = 0; i < n; i++) {
        CFrag *f = (CFrag *)PyList_GET_ITEM(list, i);
        double y_diff = fabs(last_y - f->y);
        Py_ssize_t np = PyList_GET_SIZE(parts);
        if (np && y_diff > nl_thr) {
            if (merge_hyph && last_hyphen) {
                PyObject *last = PyList_GET_ITEM(parts, np - 1);
                Py_ssize_t ll = PyUnicode_GET_LENGTH(last);
                if (ll > 0 &&
                    PyUnicode_READ_CHAR(last, ll - 1) == '-') {
                    PyObject *trim = PyUnicode_Substring(last, 0, ll - 1);
                    if (!trim)
                        goto fail;
                    if (PyList_SetItem(parts, np - 1, trim) < 0)
                        goto fail; /* SetItem stole trim */
                }
            } else {
                if (PyList_Append(parts, g_nl) < 0)
                    goto fail;
            }
        } else if (np) {
            double x_gap = f->x - last_x;
            if (x_gap > sp_thr * f->font_size) {
                if (PyList_Append(parts, g_sp) < 0)
                    goto fail;
            }
        }
        if (PyList_Append(parts, f->text) < 0)
            goto fail;
        Py_ssize_t tl = PyUnicode_GET_LENGTH(f->text);
        last_hyphen = tl > 0 && PyUnicode_READ_CHAR(f->text, tl - 1) == '-';
        last_y = f->y;
        last_x = f->x + f->width;
    }
    {
        PyObject *joined = PyUnicode_Join(g_empty, parts);
        Py_DECREF(parts);
        return joined;
    }
fail:
    Py_DECREF(parts);
    return NULL;
}

static PyMethodDef methods[] = {
    {"setup", setup, METH_VARARGS, "install shared objects"},
    {"setup_obj", setup_obj, METH_VARARGS,
     "install object-parser shared objects"},
    {"setup_layout", setup_layout, METH_VARARGS,
     "install layout-stage helpers (TextFragment, parse_font_style, "
     "frag env)"},
    {"merge_close", merge_close, METH_VARARGS,
     "merge_close_fragments fast path over CFrag lists; None = bail"},
    {"reconstruct_text", reconstruct_text, METH_VARARGS,
     "post-merge text rebuild over CFrag lists; None = bail"},
    {"setup_html", setup_html, METH_VARARGS,
     "install html-path helpers (unescape, ws_collapse, boiler_value)"},
    {"html_events", html_events_py, METH_VARARGS,
     "HTML main-content events+links; None = bail to Python"},
    {"parse_xref_sections", parse_xref_sections, METH_VARARGS,
     "strict 20-byte traditional xref sections; None = bail"},
    {"run_page", run_page, METH_VARARGS,
     "run the fast content loop; None on completion"},
    {"parse_indirect", parse_indirect, METH_VARARGS,
     "fast `N G obj value [stream]` parse; None = fall back to Python"},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "oxpdf_cscan", NULL, -1, methods,
};

PyMODINIT_FUNC PyInit_oxpdf_cscan(void)
{
#define IN(var, s)                                                            \
    do {                                                                      \
        var = PyUnicode_InternFromString(s);                                  \
        if (!var)                                                             \
            return NULL;                                                      \
    } while (0)
    IN(a_state, "state");
    IN(a_options, "options");
    IN(a_in_text, "in_text");
    IN(a_total, "_total");
    IN(a_last_x, "last_x");
    IN(a_last_y, "last_y");
    IN(a_last_char, "_last_char");
    IN(a_text_parts, "text_parts");
    IN(a_font_memo, "_font_memo");
    IN(a_decode, "_decode");
    IN(a_set_font_memo, "_set_font_memo");
    IN(a_paint_xobject, "_paint_xobject");
    IN(a_op_bmc, "_op_bmc");
    IN(a_op_emc, "_op_emc");
    IN(a_next_line_show, "_next_line_show");
    IN(a_text_matrix, "text_matrix");
    IN(a_text_line_matrix, "text_line_matrix");
    IN(a_ctm, "ctm");
    IN(a_leading, "leading");
    IN(a_char_space, "char_space");
    IN(a_word_space, "word_space");
    IN(a_horizontal_scale, "horizontal_scale");
    IN(a_text_rise, "text_rise");
    IN(a_font_size, "font_size");
    IN(a_font_name, "font_name");
    IN(a_render_mode, "render_mode");
    IN(a_fill_color, "fill_color");
    IN(a_saved, "saved");
    IN(a_artifact_n, "artifact_n");
    IN(a_newline_threshold, "newline_threshold");
    IN(a_space_threshold, "space_threshold");
    IN(a_tj_space_threshold, "tj_space_threshold");
    IN(a_include_artifacts, "include_artifacts");
    IN(a_layout, "_layout");
    IN(a_fragments, "fragments");
    IN(a_pending_absorb, "_pending_absorb");
#undef IN
    g_nl = PyUnicode_InternFromString("\n");
    g_sp = PyUnicode_InternFromString(" ");
    g_empty = PyUnicode_InternFromString("");
    g_gray = PyUnicode_InternFromString("gray");
    g_rgb = PyUnicode_InternFromString("rgb");
    g_cmyk = PyUnicode_InternFromString("cmyk");
    g_ev_text = PyUnicode_InternFromString("text");
    g_ev_img = PyUnicode_InternFromString("img");
    g_lt_str = PyUnicode_InternFromString("<");
    g_n_str = PyUnicode_InternFromString("n");
    g_f_str = PyUnicode_InternFromString("f");
    if (!g_nl || !g_sp || !g_empty || !g_gray || !g_rgb || !g_cmyk ||
        !g_ev_text || !g_ev_img || !g_lt_str || !g_n_str || !g_f_str)
        return NULL;
    if (PyType_Ready(&CFragType) < 0)
        return NULL;
    PyObject *mod = PyModule_Create(&moduledef);
    if (!mod)
        return NULL;
    Py_INCREF(&CFragType);
    if (PyModule_AddObject(mod, "CFrag", (PyObject *)&CFragType) < 0) {
        Py_DECREF(&CFragType);
        Py_DECREF(mod);
        return NULL;
    }
    return mod;
}
