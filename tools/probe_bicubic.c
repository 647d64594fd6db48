/* Bicubic resize variant probe: reconstruct the reference CUDA kernel's
 * exact arithmetic (src/Resize.cu:27-91, 314-357) by trying nvcc
 * contraction / pow variants with explicit C99 fma().
 *
 * Build: g++ -O2 -ffp-contract=off -shared -fPIC -o probe_bicubic.so probe_bicubic.c -lm
 *
 * flags bit 0: pow via multiplications (w*w, w*w*w) instead of libm pow
 * flags bit 1: contract coefficient polynomials with fma
 * flags bit 2: contract the 4-tap sum chains with fma
 * flags bit 3: pow3 = pow2 * w (only with bit 0)
 */
#include <math.h>
#include <stdint.h>
#include <stdlib.h>
#include <string.h>

static void coefs(double w, int flags, double c[4]) {
    const double a = -0.75;
    double p2, p3;
    if (flags & 1) {
        p2 = w * w;
        p3 = (flags & 8) ? p2 * w : w * w * w;
    } else {
        p2 = pow(w, 2);
        p3 = pow(w, 3);
    }
    if (flags & 2) {
        c[0] = fma(a, p3, fma(-2 * a, p2, a * w));
        c[1] = fma(a + 2, p3, fma(-(a + 3), p2, 1.0));
        c[2] = fma(-(a + 2), p3, fma(2 * a + 3, p2, -a * w));
        c[3] = fma(-a, p3, a * p2);
    } else {
        c[0] = a * w - 2 * a * p2 + a * p3;
        c[1] = 1 - (a + 3) * p2 + (a + 2) * p3;
        c[2] = -a * w + (2 * a + 3) * p2 - (a + 2) * p3;
        c[3] = a * p2 - a * p3;
    }
}

static int blend4(const double c[4], const int p[4], int flags) {
    double s;
    if (flags & 4) {
        s = fma(c[3], p[3], fma(c[2], p[2], fma(c[1], p[1], c[0] * p[0])));
    } else {
        s = c[0] * p[0] + c[1] * p[1] + c[2] * p[2] + c[3] * p[3];
    }
    int v = (int)round(s);
    if (v > 255) v = 255;
    if (v < 0) v = 0;
    return v;
}

/* coordinate: fmaf((j+0.5f), ratio, -0.5f) -> double */
static void axis(int dst_n, float ratio, int src_n, int64_t *base, double *w) {
    for (int j = 0; j < dst_n; j++) {
        double f = (double)fmaf((float)j + 0.5f, ratio, -0.5f);
        int64_t x = (int64_t)floor(f);
        double ww = f - (double)x;
        if (x < 0) { x = 0; ww = 0.0; }
        if (x > src_n - 1) { x = src_n - 1; ww = 0.0; }
        base[j] = x;
        w[j] = ww;
    }
}

/* taps (-dTop, 0, +d, +2d) with the reference collapse rules; x is the
 * plane coordinate, d the stride. */
static void taps(int64_t x, int d, int n, int64_t t[4]) {
    int dd = d, dtop = d;
    if (x + dd >= n) dd = 0;
    if (x + dd * 2 >= n) dd = 0;
    if (x - dtop < 0) dtop = 0;
    t[0] = x - dtop; t[1] = x; t[2] = x + dd; t[3] = x + 2 * dd;
}

static void plane(const uint8_t *img, int iw, int ih,
                  uint8_t *out, int ow, int oh, int ostride,
                  int ocolstride, int ocoloff,
                  const int64_t *xb, const double *wx,
                  const int64_t *yb, const double *wy,
                  int xmul, int xoff, int xdiff, int flags) {
    for (int i = 0; i < oh; i++) {
        double cy[4];
        coefs(wy[i], flags, cy);
        int64_t rt[4];
        taps(yb[i], 1, ih, rt);
        for (int j = 0; j < ow; j++) {
            double cx[4];
            coefs(wx[j], flags, cx);
            int64_t x = xb[j] * xmul + xoff;
            int64_t ct[4];
            taps(x, xdiff, iw, ct);
            int b[4];
            for (int r = 0; r < 4; r++) {
                int p[4];
                for (int k = 0; k < 4; k++)
                    p[k] = img[rt[r] * iw + ct[k]];
                b[r] = blend4(cx, p, flags);
            }
            int v = blend4(cy, b, flags);
            out[(int64_t)i * ostride + (int64_t)j * ocolstride + ocoloff] =
                (uint8_t)v;
        }
    }
}

extern "C" void bicubic_resize(const uint8_t *y, const uint8_t *uv, int sw, int sh,
                    uint8_t *oy, uint8_t *ouv, int dw, int dh, int flags) {
    float xr = (float)sw / (float)dw;
    float yr = (float)sh / (float)dh;
    int64_t *xb = (int64_t *)malloc(sizeof(int64_t) * dw);
    double *wx = (double *)malloc(sizeof(double) * dw);
    int64_t *yb = (int64_t *)malloc(sizeof(int64_t) * dh);
    double *wy = (double *)malloc(sizeof(double) * dh);
    axis(dw, xr, sw, xb, wx);
    axis(dh, yr, sh, yb, wy);
    /* Y plane */
    plane(y, sw, sh, oy, dw, dh, dw, 1, 0, xb, wx, yb, wy, 1, 0, 1, flags);
    /* UV plane: U at 2x, V at 2x+1, stride-2 taps, half height */
    plane(uv, sw, sh / 2, ouv, dw / 2, dh / 2, dw, 2, 0,
          xb, wx, yb, wy, 2, 0, 2, flags);
    plane(uv, sw, sh / 2, ouv, dw / 2, dh / 2, dw, 2, 1,
          xb, wx, yb, wy, 2, 1, 2, flags);
    free(xb); free(wx); free(yb); free(wy);
}
