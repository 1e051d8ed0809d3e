/* Native geometry kernels: OBJ triangle-mesh loading and Mirtich-style
 * polyhedral mass properties.
 *
 * This is the performance role of the reference's native mesh stack
 * (c++/PCG/src/tiny_obj_loader.h + the VolumeIntegration routine of
 * matlab/+redmax/BodyMeshObj.m, itself a port of Mirtich 1996 volInt.c):
 * asset pipelines load thousands of meshes at scene-compile time, so the
 * inner loops are C. Exposed via ctypes (see redmax_tpu/mesh.py, which
 * also carries a numpy fallback with identical semantics).
 *
 * Build: cc -O2 -shared -fPIC -o _geometry.so geometry.c
 */

#include <math.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

/* ---------------- Mirtich polyhedral volume integrals ----------------- */

static void face_integrals(const double *v0, const double *v1, const double *v2,
                           double *T0, double T1[3], double T2[3], double TP[3])
{
    /* Face normal */
    double e1[3], e2[3], n[3];
    int i;
    for (i = 0; i < 3; i++) {
        e1[i] = v1[i] - v0[i];
        e2[i] = v2[i] - v0[i];
    }
    n[0] = e1[1] * e2[2] - e1[2] * e2[1];
    n[1] = e1[2] * e2[0] - e1[0] * e2[2];
    n[2] = e1[0] * e2[1] - e1[1] * e2[0];
    double len = sqrt(n[0] * n[0] + n[1] * n[1] + n[2] * n[2]);
    if (len < 1e-30) return;
    for (i = 0; i < 3; i++) n[i] /= len;

    /* Choose projection axes: C = largest |n| component, A, B the others */
    int C = 0;
    if (fabs(n[1]) > fabs(n[C])) C = 1;
    if (fabs(n[2]) > fabs(n[C])) C = 2;
    int A = (C + 1) % 3, B = (C + 2) % 3;

    /* Projection integrals over the triangle in the A-B plane */
    double P1 = 0, Pa = 0, Pb = 0, Paa = 0, Pab = 0, Pbb = 0;
    double Paaa = 0, Paab = 0, Pabb = 0, Pbbb = 0;
    const double *verts[3] = { v0, v1, v2 };
    for (i = 0; i < 3; i++) {
        double a0 = verts[i][A], b0 = verts[i][B];
        double a1 = verts[(i + 1) % 3][A], b1 = verts[(i + 1) % 3][B];
        double da = a1 - a0, db = b1 - b0;
        double a0_2 = a0 * a0, a0_3 = a0_2 * a0, a0_4 = a0_3 * a0;
        double b0_2 = b0 * b0, b0_3 = b0_2 * b0, b0_4 = b0_3 * b0;
        double a1_2 = a1 * a1, a1_3 = a1_2 * a1;
        double b1_2 = b1 * b1, b1_3 = b1_2 * b1;
        double C1 = a1 + a0;
        double Ca = a1 * C1 + a0_2, Caa = a1 * Ca + a0_3, Caaa = a1 * Caa + a0_4;
        double Cb = b1 * (b1 + b0) + b0_2, Cbb = b1 * Cb + b0_3,
               Cbbb = b1 * Cbb + b0_4;
        double Cab = 3 * a1_2 + 2 * a1 * a0 + a0_2;
        double Kab = a1_2 + 2 * a1 * a0 + 3 * a0_2;
        double Caab = a0 * Cab + 4 * a1_3;
        double Kaab = a1 * Kab + 4 * a0_3;
        double Cabb = 4 * b1_3 + 3 * b1_2 * b0 + 2 * b1 * b0_2 + b0_3;
        double Kabb = b1_3 + 2 * b1_2 * b0 + 3 * b1 * b0_2 + 4 * b0_3;
        P1 += db * C1;
        Pa += db * Ca;
        Paa += db * Caa;
        Paaa += db * Caaa;
        Pb += da * Cb;
        Pbb += da * Cbb;
        Pbbb += da * Cbbb;
        Pab += db * (b1 * Cab + b0 * Kab);
        Paab += db * (b1 * Caab + b0 * Kaab);
        Pabb += da * (a1 * Cabb + a0 * Kabb);
    }
    P1 /= 2.0;
    Pa /= 6.0;  Paa /= 12.0;  Paaa /= 20.0;
    Pb /= -6.0; Pbb /= -12.0; Pbbb /= -20.0;
    Pab /= 24.0; Paab /= 60.0; Pabb /= -60.0;

    /* Face integrals */
    double w = -(n[0] * v0[0] + n[1] * v0[1] + n[2] * v0[2]);
    double na = n[A], nb = n[B], nc = n[C];
    double k1 = 1.0 / nc, k2 = k1 * k1, k3 = k2 * k1, k4 = k3 * k1;
    double Fa = k1 * Pa, Fb = k1 * Pb;
    double Fc = -k2 * (na * Pa + nb * Pb + w * P1);
    double Faa = k1 * Paa, Fbb = k1 * Pbb;
    double Fcc = k3 * (na * na * Paa + 2 * na * nb * Pab + nb * nb * Pbb +
                       w * (2 * (na * Pa + nb * Pb) + w * P1));
    double Faaa = k1 * Paaa, Fbbb = k1 * Pbbb;
    double Fccc = -k4 * (na * na * na * Paaa + 3 * na * na * nb * Paab +
                         3 * na * nb * nb * Pabb + nb * nb * nb * Pbbb +
                         3 * w * (na * na * Paa + 2 * na * nb * Pab +
                                  nb * nb * Pbb) +
                         w * w * (3 * (na * Pa + nb * Pb) + w * P1));
    double Faab = k1 * Paab;
    double Fbbc = -k2 * (na * Pabb + nb * Pbbb + w * Pbb);
    double Fcca = k3 * (na * na * Paaa + 2 * na * nb * Paab + nb * nb * Pabb +
                        w * (2 * (na * Paa + nb * Pab) + w * Pa));

    *T0 += n[0] * ((A == 0) ? Fa : ((B == 0) ? Fb : Fc));
    T1[A] += na * Faa; T1[B] += nb * Fbb; T1[C] += nc * Fcc;
    T2[A] += na * Faaa; T2[B] += nb * Fbbb; T2[C] += nc * Fccc;
    TP[A] += na * Faab; TP[B] += nb * Fbbc; TP[C] += nc * Fcca;
}

/* volume_integrals: V [nv*3], F [nf*3] (0-based), outputs T0, T1[3], T2[3], TP[3] */
void volume_integrals(const double *V, long nv, const long *F, long nf,
                      double *T0, double *T1, double *T2, double *TP)
{
    (void)nv;
    *T0 = 0;
    memset(T1, 0, 3 * sizeof(double));
    memset(T2, 0, 3 * sizeof(double));
    memset(TP, 0, 3 * sizeof(double));
    for (long f = 0; f < nf; f++) {
        const double *v0 = V + 3 * F[3 * f + 0];
        const double *v1 = V + 3 * F[3 * f + 1];
        const double *v2 = V + 3 * F[3 * f + 2];
        face_integrals(v0, v1, v2, T0, T1, T2, TP);
    }
    T1[0] /= 2; T1[1] /= 2; T1[2] /= 2;
    T2[0] /= 3; T2[1] /= 3; T2[2] /= 3;
    TP[0] /= 2; TP[1] /= 2; TP[2] /= 2;
}

/* ----------------------------- OBJ loader ------------------------------ */
/* Parses v/f lines; triangulates polygon faces as fans; returns counts.
 * Two-pass API: first call with NULL outputs to get counts. */
int load_obj(const char *path, double *verts, long *faces, long *nv, long *nf)
{
    FILE *fp = fopen(path, "r");
    if (!fp) return -1;
    char line[4096];
    long v = 0, f = 0;
    while (fgets(line, sizeof line, fp)) {
        if (line[0] == 'v' && (line[1] == ' ' || line[1] == '\t')) {
            double x, y, z;
            if (sscanf(line + 1, "%lf %lf %lf", &x, &y, &z) == 3) {
                if (verts) {
                    verts[3 * v + 0] = x;
                    verts[3 * v + 1] = y;
                    verts[3 * v + 2] = z;
                }
                v++;
            }
        } else if (line[0] == 'f' && (line[1] == ' ' || line[1] == '\t')) {
            long idx[64];
            int n = 0;
            char *tok = strtok(line + 1, " \t\r\n");
            while (tok && n < 64) {
                idx[n++] = strtol(tok, NULL, 10) - 1; /* 1-based; ignore /vt/vn */
                tok = strtok(NULL, " \t\r\n");
            }
            for (int i = 1; i + 1 < n; i++) {
                if (faces) {
                    faces[3 * f + 0] = idx[0];
                    faces[3 * f + 1] = idx[i];
                    faces[3 * f + 2] = idx[i + 1];
                }
                f++;
            }
        }
    }
    fclose(fp);
    *nv = v;
    *nf = f;
    return 0;
}
