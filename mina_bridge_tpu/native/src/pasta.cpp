// Native Pasta host-crypto runtime: Montgomery field core, Poseidon
// permutation, radix-2 NTT, polynomial evaluation and a Pippenger MSM.
//
// Role parity: the reference's host runtime is native Rust — the
// `openmina_algebra` (ark-ff/ark-ec fork) field/curve stack and
// `mina-poseidon` (SURVEY.md §2b, core/Cargo.toml:14-27). Here the HOST
// side of this framework (fixture prover, oracles, binprot/state
// hashing) gets the same native treatment; all TPU compute stays in
// JAX/Pallas. Pure-Python paths remain the portable fallback and the
// correctness oracle (fields/host.py, hash/poseidon.py, kimchi/domain.py).
//
// Everything is parameterized by a caller-supplied Montgomery context
// (p, R^2 mod p, -p^-1 mod 2^64) so the Python parameter tables stay the
// single source of truth; nothing field-specific is hardcoded.
//
// Build: g++ -O3 -shared -fPIC -o libmbtpu_native.so keccak.cpp pasta.cpp
// All values cross the ABI as canonical little-endian 4x uint64 words.

#include <cstdint>
#include <cstring>
#include <vector>

using u64 = uint64_t;
using u128 = unsigned __int128;

namespace {

struct Ctx {
  u64 p[4];
  u64 r2[4];  // (2^256)^2 mod p
  u64 n0inv;  // -p^{-1} mod 2^64
};

inline bool geq(const u64* a, const u64* b) {
  for (int i = 3; i >= 0; --i) {
    if (a[i] != b[i]) return a[i] > b[i];
  }
  return true;
}

inline void sub4(u64* a, const u64* b) {  // a -= b (caller ensures a >= b)
  u64 borrow = 0;
  for (int i = 0; i < 4; ++i) {
    u128 rhs = (u128)b[i] + borrow;
    u64 r = (u64)((u128)a[i] - rhs);
    borrow = ((u128)a[i] < rhs) ? 1 : 0;
    a[i] = r;
  }
}

inline void cond_sub_p(const Ctx& c, u64* a, u64 hi) {
  if (hi || geq(a, c.p)) sub4(a, c.p);
}

inline void mont_mul(const Ctx& c, const u64* a, const u64* b, u64* out) {
  u64 t[6] = {0, 0, 0, 0, 0, 0};
  for (int i = 0; i < 4; ++i) {
    u64 carry = 0;
    for (int j = 0; j < 4; ++j) {
      u128 cur = (u128)t[j] + (u128)a[i] * b[j] + carry;
      t[j] = (u64)cur;
      carry = (u64)(cur >> 64);
    }
    u128 cur = (u128)t[4] + carry;
    t[4] = (u64)cur;
    t[5] = (u64)(cur >> 64);
    u64 m = t[0] * c.n0inv;
    cur = (u128)t[0] + (u128)m * c.p[0];
    carry = (u64)(cur >> 64);
    for (int j = 1; j < 4; ++j) {
      cur = (u128)t[j] + (u128)m * c.p[j] + carry;
      t[j - 1] = (u64)cur;
      carry = (u64)(cur >> 64);
    }
    cur = (u128)t[4] + carry;
    t[3] = (u64)cur;
    t[4] = t[5] + (u64)(cur >> 64);
    t[5] = 0;
  }
  cond_sub_p(c, t, t[4]);
  memcpy(out, t, 32);
}

inline void mont_sqr(const Ctx& c, const u64* a, u64* out) {
  mont_mul(c, a, a, out);
}

inline void fadd(const Ctx& c, const u64* a, const u64* b, u64* out) {
  u64 t[4];
  u64 carry = 0;
  for (int i = 0; i < 4; ++i) {
    u128 cur = (u128)a[i] + b[i] + carry;
    t[i] = (u64)cur;
    carry = (u64)(cur >> 64);
  }
  cond_sub_p(c, t, carry);
  memcpy(out, t, 32);
}

inline void fsub(const Ctx& c, const u64* a, const u64* b, u64* out) {
  u64 t[4];
  memcpy(t, a, 32);
  if (!geq(t, b)) {
    u64 carry = 0;  // t += p
    for (int i = 0; i < 4; ++i) {
      u128 cur = (u128)t[i] + c.p[i] + carry;
      t[i] = (u64)cur;
      carry = (u64)(cur >> 64);
    }
  }
  sub4(t, b);
  memcpy(out, t, 32);
}

inline void to_mont(const Ctx& c, const u64* a, u64* out) {
  mont_mul(c, a, c.r2, out);
}

inline void from_mont(const Ctx& c, const u64* a, u64* out) {
  u64 one[4] = {1, 0, 0, 0};
  mont_mul(c, a, one, out);
}

inline void mont_one(const Ctx& c, u64* out) {
  u64 one[4] = {1, 0, 0, 0};
  to_mont(c, one, out);
}

void mont_pow(const Ctx& c, const u64* base, const u64* e, u64* out) {
  u64 acc[4];
  mont_one(c, acc);
  u64 b[4];
  memcpy(b, base, 32);
  for (int w = 0; w < 4; ++w) {
    u64 bits = e[w];
    for (int i = 0; i < 64; ++i) {
      // left-to-right needs msb-first; use right-to-left instead:
      if (bits & 1) mont_mul(c, acc, b, acc);
      mont_sqr(c, b, b);
      bits >>= 1;
    }
  }
  memcpy(out, acc, 32);
}

void mont_inv(const Ctx& c, const u64* a, u64* out) {  // a^(p-2)
  u64 e[4];
  memcpy(e, c.p, 32);
  // e = p - 2
  u64 two[4] = {2, 0, 0, 0};
  sub4(e, two);
  mont_pow(c, a, e, out);
}

inline bool is_zero4(const u64* a) {
  return !(a[0] | a[1] | a[2] | a[3]);
}

// ---------------------------------------------------------------------
// Jacobian curve ops over y^2 = x^3 + b (a = 0), b in Montgomery form.
// Infinity is encoded as Z == 0.
// ---------------------------------------------------------------------

struct Pt {
  u64 x[4], y[4], z[4];
};

void pt_double(const Ctx& c, const Pt& p, Pt& r) {  // dbl-2009-l
  // NOTE: r may alias p — compute into a local and copy out.
  if (is_zero4(p.z)) {
    r = p;
    return;
  }
  Pt o;
  u64 A[4], B[4], C[4], D[4], E[4], F[4], t[4], t2[4];
  mont_sqr(c, p.x, A);
  mont_sqr(c, p.y, B);
  mont_sqr(c, B, C);
  // D = 2*((X1+B)^2 - A - C)
  fadd(c, p.x, B, t);
  mont_sqr(c, t, t);
  fsub(c, t, A, t);
  fsub(c, t, C, t);
  fadd(c, t, t, D);
  // E = 3*A
  fadd(c, A, A, E);
  fadd(c, E, A, E);
  mont_sqr(c, E, F);
  // X3 = F - 2*D
  fadd(c, D, D, t);
  fsub(c, F, t, o.x);
  // Y3 = E*(D - X3) - 8*C
  fsub(c, D, o.x, t);
  mont_mul(c, E, t, t);
  fadd(c, C, C, t2);
  fadd(c, t2, t2, t2);
  fadd(c, t2, t2, t2);
  fsub(c, t, t2, o.y);
  // Z3 = 2*Y1*Z1
  mont_mul(c, p.y, p.z, t);
  fadd(c, t, t, o.z);
  r = o;
}

void pt_add(const Ctx& c, const Pt& p, const Pt& q, Pt& r) {  // add-2007-bl
  if (is_zero4(p.z)) {
    r = q;
    return;
  }
  if (is_zero4(q.z)) {
    r = p;
    return;
  }
  u64 Z1Z1[4], Z2Z2[4], U1[4], U2[4], S1[4], S2[4], H[4], I[4], J[4];
  u64 rr[4], V[4], t[4], t2[4];
  mont_sqr(c, p.z, Z1Z1);
  mont_sqr(c, q.z, Z2Z2);
  mont_mul(c, p.x, Z2Z2, U1);
  mont_mul(c, q.x, Z1Z1, U2);
  mont_mul(c, p.y, q.z, t);
  mont_mul(c, t, Z2Z2, S1);
  mont_mul(c, q.y, p.z, t);
  mont_mul(c, t, Z1Z1, S2);
  fsub(c, U2, U1, H);
  fsub(c, S2, S1, rr);
  if (is_zero4(H)) {
    if (is_zero4(rr)) {
      pt_double(c, p, r);
      return;
    }
    memset(&r, 0, sizeof(Pt));  // P + (-P) = infinity
    return;
  }
  // I = (2H)^2, J = H*I, rr = 2*(S2-S1), V = U1*I
  Pt o;
  fadd(c, H, H, t);
  mont_sqr(c, t, I);
  mont_mul(c, H, I, J);
  fadd(c, rr, rr, rr);
  mont_mul(c, U1, I, V);
  // X3 = rr^2 - J - 2*V
  mont_sqr(c, rr, t);
  fsub(c, t, J, t);
  fadd(c, V, V, t2);
  fsub(c, t, t2, o.x);
  // Y3 = rr*(V - X3) - 2*S1*J
  fsub(c, V, o.x, t);
  mont_mul(c, rr, t, t);
  mont_mul(c, S1, J, t2);
  fadd(c, t2, t2, t2);
  fsub(c, t, t2, o.y);
  // Z3 = ((Z1+Z2)^2 - Z1Z1 - Z2Z2) * H
  fadd(c, p.z, q.z, t);
  mont_sqr(c, t, t);
  fsub(c, t, Z1Z1, t);
  fsub(c, t, Z2Z2, t);
  mont_mul(c, t, H, o.z);
  r = o;
}

// mixed add: q affine (z implicitly 1, both coords Montgomery)
void pt_madd(const Ctx& c, const Pt& p, const u64* qx, const u64* qy, Pt& r) {
  if (is_zero4(p.z)) {
    memcpy(r.x, qx, 32);
    memcpy(r.y, qy, 32);
    mont_one(c, r.z);
    return;
  }
  u64 Z1Z1[4], U2[4], S2[4], H[4], HH[4], I[4], J[4], rr[4], V[4], t[4], t2[4];
  mont_sqr(c, p.z, Z1Z1);
  mont_mul(c, qx, Z1Z1, U2);
  mont_mul(c, qy, p.z, t);
  mont_mul(c, t, Z1Z1, S2);
  fsub(c, U2, p.x, H);
  fsub(c, S2, p.y, rr);
  if (is_zero4(H)) {
    if (is_zero4(rr)) {
      Pt q;
      memcpy(q.x, qx, 32);
      memcpy(q.y, qy, 32);
      mont_one(c, q.z);
      pt_double(c, q, r);
      return;
    }
    memset(&r, 0, sizeof(Pt));
    return;
  }
  Pt o;
  mont_sqr(c, H, HH);
  fadd(c, HH, HH, I);
  fadd(c, I, I, I);
  mont_mul(c, H, I, J);
  fadd(c, rr, rr, rr);
  mont_mul(c, p.x, I, V);
  mont_sqr(c, rr, t);
  fsub(c, t, J, t);
  fadd(c, V, V, t2);
  fsub(c, t, t2, o.x);
  fsub(c, V, o.x, t);
  mont_mul(c, rr, t, t);
  mont_mul(c, p.y, J, t2);
  fadd(c, t2, t2, t2);
  fsub(c, t, t2, o.y);
  fadd(c, p.z, H, t);
  mont_sqr(c, t, t);
  fsub(c, t, Z1Z1, t);
  fsub(c, t, HH, o.z);
  r = o;
}

}  // namespace

extern "C" {

// ---- field ops (canonical in/out) ----

void mbtpu_field_mul_batch(const u64* ctx_words, const u64* a, const u64* b,
                           u64 n, u64* out) {
  Ctx c;
  memcpy(&c, ctx_words, sizeof(Ctx));
  u64 am[4], bm[4], r[4];
  for (u64 i = 0; i < n; ++i) {
    to_mont(c, a + 4 * i, am);
    to_mont(c, b + 4 * i, bm);
    mont_mul(c, am, bm, r);
    from_mont(c, r, out + 4 * i);
  }
}

void mbtpu_field_inv_batch(const u64* ctx_words, const u64* a, u64 n,
                           u64* out) {
  // Montgomery batch inversion: 3 muls/element + one exponentiation.
  Ctx c;
  memcpy(&c, ctx_words, sizeof(Ctx));
  std::vector<u64> am(4 * n), prefix(4 * n);
  u64 acc[4];
  mont_one(c, acc);
  for (u64 i = 0; i < n; ++i) {
    to_mont(c, a + 4 * i, &am[4 * i]);
    memcpy(&prefix[4 * i], acc, 32);
    if (!is_zero4(&am[4 * i])) mont_mul(c, acc, &am[4 * i], acc);
  }
  u64 inv[4];
  mont_inv(c, acc, inv);
  for (u64 i = n; i-- > 0;) {
    if (is_zero4(&am[4 * i])) {
      memset(out + 4 * i, 0, 32);
      continue;
    }
    u64 r[4];
    mont_mul(c, inv, &prefix[4 * i], r);
    mont_mul(c, inv, &am[4 * i], inv);
    from_mont(c, r, out + 4 * i);
  }
}

// ---- Poseidon (kimchi shape: all-full rounds, x^7, MDS, post-ark) ----

void mbtpu_poseidon_permute_batch(const u64* ctx_words, const u64* rc,
                                  u64 nrounds, const u64* mds, u64* states,
                                  u64 n) {
  Ctx c;
  memcpy(&c, ctx_words, sizeof(Ctx));
  std::vector<u64> rcm(12 * nrounds), mdsm(36);
  for (u64 i = 0; i < 3 * nrounds; ++i) to_mont(c, rc + 4 * i, &rcm[4 * i]);
  for (int i = 0; i < 9; ++i) to_mont(c, mds + 4 * i, &mdsm[4 * i]);
  for (u64 s = 0; s < n; ++s) {
    u64 st[3][4], sb[3][4], nx[3][4], t[4];
    for (int j = 0; j < 3; ++j) to_mont(c, states + 12 * s + 4 * j, st[j]);
    for (u64 r = 0; r < nrounds; ++r) {
      for (int j = 0; j < 3; ++j) {
        u64 x2[4], x3[4];
        mont_sqr(c, st[j], x2);
        mont_mul(c, x2, st[j], x3);
        mont_mul(c, x3, x3, t);  // x^6
        mont_mul(c, t, st[j], sb[j]);
      }
      for (int j = 0; j < 3; ++j) {
        memcpy(nx[j], &rcm[12 * r + 4 * j], 32);
        for (int k = 0; k < 3; ++k) {
          mont_mul(c, &mdsm[4 * (3 * j + k)], sb[k], t);
          fadd(c, nx[j], t, nx[j]);
        }
      }
      for (int j = 0; j < 3; ++j) memcpy(st[j], nx[j], 32);
    }
    for (int j = 0; j < 3; ++j) from_mont(c, st[j], states + 12 * s + 4 * j);
  }
}

// ---- radix-2 NTT (in-place, canonical in/out) ----

void mbtpu_ntt(const u64* ctx_words, u64* data, u64 n, const u64* root) {
  Ctx c;
  memcpy(&c, ctx_words, sizeof(Ctx));
  std::vector<u64> a(4 * n);
  for (u64 i = 0; i < n; ++i) to_mont(c, data + 4 * i, &a[4 * i]);
  // bit reversal
  u64 j = 0;
  for (u64 i = 1; i < n; ++i) {
    u64 bit = n >> 1;
    for (; j & bit; bit >>= 1) j ^= bit;
    j |= bit;
    if (i < j) {
      u64 tmp[4];
      memcpy(tmp, &a[4 * i], 32);
      memcpy(&a[4 * i], &a[4 * j], 32);
      memcpy(&a[4 * j], tmp, 32);
    }
  }
  u64 rootm[4];
  to_mont(c, root, rootm);
  for (u64 length = 2; length <= n; length <<= 1) {
    // w_len = root^(n/length)
    u64 wl[4];
    memcpy(wl, rootm, 32);
    for (u64 m = n / length; m > 1; m >>= 1) mont_sqr(c, wl, wl);
    for (u64 start = 0; start < n; start += length) {
      u64 w[4];
      mont_one(c, w);
      u64 half = length >> 1;
      for (u64 i = start; i < start + half; ++i) {
        u64 u[4], v[4];
        memcpy(u, &a[4 * i], 32);
        mont_mul(c, &a[4 * (i + half)], w, v);
        fadd(c, u, v, &a[4 * i]);
        fsub(c, u, v, &a[4 * (i + half)]);
        mont_mul(c, w, wl, w);
      }
    }
  }
  for (u64 i = 0; i < n; ++i) from_mont(c, &a[4 * i], data + 4 * i);
}

// data[i] *= s0 * ratio^i (canonical in/out) — ifft scaling / coset shift
void mbtpu_scale_geometric(const u64* ctx_words, u64* data, u64 n,
                           const u64* s0, const u64* ratio) {
  Ctx c;
  memcpy(&c, ctx_words, sizeof(Ctx));
  u64 sc[4], rm[4], x[4];
  to_mont(c, s0, sc);
  to_mont(c, ratio, rm);
  for (u64 i = 0; i < n; ++i) {
    to_mont(c, data + 4 * i, x);
    mont_mul(c, x, sc, x);
    from_mont(c, x, data + 4 * i);
    mont_mul(c, sc, rm, sc);
  }
}

// out[k] = poly(xs[k]) for m polynomials of length n (Horner)
void mbtpu_poly_eval(const u64* ctx_words, const u64* coeffs, u64 n,
                     const u64* xs, u64 k, u64* out) {
  Ctx c;
  memcpy(&c, ctx_words, sizeof(Ctx));
  for (u64 e = 0; e < k; ++e) {
    u64 xm[4], acc[4] = {0, 0, 0, 0}, cm[4];
    to_mont(c, xs + 4 * e, xm);
    for (u64 i = n; i-- > 0;) {
      mont_mul(c, acc, xm, acc);
      to_mont(c, coeffs + 4 * i, cm);
      fadd(c, acc, cm, acc);
    }
    from_mont(c, acc, out + 4 * e);
  }
}

// ---- Montgomery-domain vector ops (vectorized prover hot path) ----
// All arrays are n*4 little-endian words. Unless noted, values are in
// MONTGOMERY form (xR mod p); add/sub are domain-agnostic. Scalars `s`
// are a single 4-word Montgomery value. kimchi/prover_vec.py drives
// these over the 8n quotient coset; the Python per-row loop in
// kimchi/prover_host.py remains the bit-exactness oracle.

void mbtpu_vadd(const u64* ctx_words, const u64* a, const u64* b, u64 n,
                u64* out) {
  Ctx c;
  memcpy(&c, ctx_words, sizeof(Ctx));
  for (u64 i = 0; i < n; ++i) fadd(c, a + 4 * i, b + 4 * i, out + 4 * i);
}

void mbtpu_vsub(const u64* ctx_words, const u64* a, const u64* b, u64 n,
                u64* out) {
  Ctx c;
  memcpy(&c, ctx_words, sizeof(Ctx));
  for (u64 i = 0; i < n; ++i) fsub(c, a + 4 * i, b + 4 * i, out + 4 * i);
}

void mbtpu_vadd_s(const u64* ctx_words, const u64* a, const u64* s, u64 n,
                  u64* out) {
  Ctx c;
  memcpy(&c, ctx_words, sizeof(Ctx));
  for (u64 i = 0; i < n; ++i) fadd(c, a + 4 * i, s, out + 4 * i);
}

void mbtpu_vsub_s(const u64* ctx_words, const u64* a, const u64* s, u64 n,
                  u64* out) {
  Ctx c;
  memcpy(&c, ctx_words, sizeof(Ctx));
  for (u64 i = 0; i < n; ++i) fsub(c, a + 4 * i, s, out + 4 * i);
}

// out = s - a  (scalar minus vector)
void mbtpu_vsub_rs(const u64* ctx_words, const u64* a, const u64* s, u64 n,
                   u64* out) {
  Ctx c;
  memcpy(&c, ctx_words, sizeof(Ctx));
  for (u64 i = 0; i < n; ++i) fsub(c, s, a + 4 * i, out + 4 * i);
}

void mbtpu_vmulm(const u64* ctx_words, const u64* a, const u64* b, u64 n,
                 u64* out) {
  Ctx c;
  memcpy(&c, ctx_words, sizeof(Ctx));
  for (u64 i = 0; i < n; ++i) mont_mul(c, a + 4 * i, b + 4 * i, out + 4 * i);
}

void mbtpu_vmulm_s(const u64* ctx_words, const u64* a, const u64* s, u64 n,
                   u64* out) {
  Ctx c;
  memcpy(&c, ctx_words, sizeof(Ctx));
  for (u64 i = 0; i < n; ++i) mont_mul(c, a + 4 * i, s, out + 4 * i);
}

void mbtpu_vto_mont(const u64* ctx_words, const u64* a, u64 n, u64* out) {
  Ctx c;
  memcpy(&c, ctx_words, sizeof(Ctx));
  for (u64 i = 0; i < n; ++i) to_mont(c, a + 4 * i, out + 4 * i);
}

void mbtpu_vfrom_mont(const u64* ctx_words, const u64* a, u64 n, u64* out) {
  Ctx c;
  memcpy(&c, ctx_words, sizeof(Ctx));
  for (u64 i = 0; i < n; ++i) from_mont(c, a + 4 * i, out + 4 * i);
}

// batch inversion in the Montgomery domain (zeros map to zero)
void mbtpu_vinvm(const u64* ctx_words, const u64* a, u64 n, u64* out) {
  Ctx c;
  memcpy(&c, ctx_words, sizeof(Ctx));
  std::vector<u64> prefix(4 * n);
  u64 acc[4];
  mont_one(c, acc);
  for (u64 i = 0; i < n; ++i) {
    memcpy(&prefix[4 * i], acc, 32);
    if (!is_zero4(a + 4 * i)) mont_mul(c, acc, a + 4 * i, acc);
  }
  u64 inv[4];
  mont_inv(c, acc, inv);
  for (u64 i = n; i-- > 0;) {
    if (is_zero4(a + 4 * i)) {
      memset(out + 4 * i, 0, 32);
      continue;
    }
    u64 r[4];
    mont_mul(c, inv, &prefix[4 * i], r);
    mont_mul(c, inv, a + 4 * i, inv);
    memcpy(out + 4 * i, r, 32);
  }
}

// in-place NTT over Montgomery-form data; root is CANONICAL
void mbtpu_nttm(const u64* ctx_words, u64* data, u64 n, const u64* root) {
  Ctx c;
  memcpy(&c, ctx_words, sizeof(Ctx));
  u64* a = data;
  u64 j = 0;
  for (u64 i = 1; i < n; ++i) {
    u64 bit = n >> 1;
    for (; j & bit; bit >>= 1) j ^= bit;
    j |= bit;
    if (i < j) {
      u64 tmp[4];
      memcpy(tmp, &a[4 * i], 32);
      memcpy(&a[4 * i], &a[4 * j], 32);
      memcpy(&a[4 * j], tmp, 32);
    }
  }
  u64 rootm[4];
  to_mont(c, root, rootm);
  for (u64 length = 2; length <= n; length <<= 1) {
    u64 wl[4];
    memcpy(wl, rootm, 32);
    for (u64 m = n / length; m > 1; m >>= 1) mont_sqr(c, wl, wl);
    for (u64 start = 0; start < n; start += length) {
      u64 w[4];
      mont_one(c, w);
      u64 half = length >> 1;
      for (u64 i = start; i < start + half; ++i) {
        u64 u[4], v[4];
        memcpy(u, &a[4 * i], 32);
        mont_mul(c, &a[4 * (i + half)], w, v);
        fadd(c, u, v, &a[4 * i]);
        fsub(c, u, v, &a[4 * (i + half)]);
        mont_mul(c, w, wl, w);
      }
    }
  }
}

// in-place data[i] *= s0 * ratio^i over Montgomery data; s0/ratio CANONICAL
void mbtpu_scale_geom_m(const u64* ctx_words, u64* data, u64 n, const u64* s0,
                        const u64* ratio) {
  Ctx c;
  memcpy(&c, ctx_words, sizeof(Ctx));
  u64 sc[4], rm[4];
  to_mont(c, s0, sc);
  to_mont(c, ratio, rm);
  for (u64 i = 0; i < n; ++i) {
    mont_mul(c, data + 4 * i, sc, data + 4 * i);
    mont_mul(c, sc, rm, sc);
  }
}

// ---- Pippenger MSM over an a=0 short-Weierstrass curve ----
// points: n * (x, y) canonical affine (the identity is not representable
// affine; callers never pass it). scalars: n * 4 words canonical.
// out: (x, y, is_inf) with x, y canonical affine.

void mbtpu_msm(const u64* ctx_words, const u64* points, const u64* scalars,
               u64 n, u64* out_xy, u64* out_inf) {
  Ctx c;
  memcpy(&c, ctx_words, sizeof(Ctx));
  int w = 4;
  if (n >= 32) w = 8;
  if (n >= (1u << 13)) w = 12;
  int nwin = (256 + w - 1) / w;
  u64 nbuckets = (1ull << w) - 1;
  std::vector<u64> pm(8 * n);
  for (u64 i = 0; i < n; ++i) {
    to_mont(c, points + 8 * i, &pm[8 * i]);
    to_mont(c, points + 8 * i + 4, &pm[8 * i + 4]);
  }
  Pt total;
  memset(&total, 0, sizeof(Pt));
  std::vector<Pt> buckets(nbuckets);
  for (int win = nwin - 1; win >= 0; --win) {
    for (int d = 0; d < w && win != nwin - 1; ++d) pt_double(c, total, total);
    memset(buckets.data(), 0, nbuckets * sizeof(Pt));
    int lo = win * w;
    for (u64 i = 0; i < n; ++i) {
      // digit = bits [lo, lo+w) of scalar i
      int word = lo >> 6, off = lo & 63;
      u64 d = scalars[4 * i + word] >> off;
      if (off + w > 64 && word < 3) d |= scalars[4 * i + word + 1] << (64 - off);
      d &= nbuckets;
      if (!d) continue;
      Pt& b = buckets[d - 1];
      pt_madd(c, b, &pm[8 * i], &pm[8 * i + 4], b);
    }
    Pt run, sum;
    memset(&run, 0, sizeof(Pt));
    memset(&sum, 0, sizeof(Pt));
    for (u64 d = nbuckets; d-- > 0;) {
      pt_add(c, run, buckets[d], run);
      pt_add(c, sum, run, sum);
    }
    pt_add(c, total, sum, total);
  }
  if (is_zero4(total.z)) {
    memset(out_xy, 0, 64);
    *out_inf = 1;
    return;
  }
  u64 zi[4], zi2[4], zi3[4], t[4];
  mont_inv(c, total.z, zi);
  mont_sqr(c, zi, zi2);
  mont_mul(c, zi2, zi, zi3);
  mont_mul(c, total.x, zi2, t);
  from_mont(c, t, out_xy);
  mont_mul(c, total.y, zi3, t);
  from_mont(c, t, out_xy + 4);
  *out_inf = 0;
}

}  // extern "C"
