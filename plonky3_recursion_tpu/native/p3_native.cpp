// Scalar bit-exact reference library (C++, no deps).
//
// TPU-native equivalent of the reference's Rust scalar core (SURVEY.md §7.1
// "C++ where native is needed"): Monty31 field arithmetic, the Poseidon2
// permutation, PaddingFreeSponge / 2-to-1 compression, and the duplex
// Fiat-Shamir challenger.  Serves as (a) the golden-vector oracle the
// JAX/Pallas kernels are tested against, and (b) a fast host-side
// transcript engine (the challenger is inherently sequential).
//
// Parameters (prime, Montgomery magic, round constants, internal diagonal)
// are injected from Python at init so the constants live in exactly one
// place (ops/poseidon2.py's deterministic derivation).

#include <cstdint>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

struct P3Field {
  uint32_t p;
  uint32_t np;  // -p^-1 mod 2^32
  uint32_t r2;  // 2^64 mod p
};

static inline uint32_t monty_mul(const P3Field* f, uint32_t a, uint32_t b) {
  uint64_t t = (uint64_t)a * b;
  uint32_t m = (uint32_t)t * f->np;
  uint64_t u = (t + (uint64_t)m * f->p) >> 32;
  return u >= f->p ? (uint32_t)(u - f->p) : (uint32_t)u;
}

static inline uint32_t addmod(const P3Field* f, uint32_t a, uint32_t b) {
  uint32_t s = a + b;
  return s >= f->p ? s - f->p : s;
}

static inline uint32_t submod(const P3Field* f, uint32_t a, uint32_t b) {
  return a >= b ? a - b : a + f->p - b;
}

static inline uint32_t mulmod(const P3Field* f, uint32_t a, uint32_t b) {
  return monty_mul(f, monty_mul(f, a, f->r2), b);
}

uint32_t p3n_mulmod(uint32_t p, uint32_t np, uint32_t r2, uint32_t a,
                    uint32_t b) {
  P3Field f{p, np, r2};
  return mulmod(&f, a, b);
}

void p3n_mulmod_vec(uint32_t p, uint32_t np, uint32_t r2, const uint32_t* a,
                    const uint32_t* b, uint32_t* out, uint64_t n) {
  P3Field f{p, np, r2};
#pragma omp parallel for schedule(static) if (n > 65536)
  for (uint64_t i = 0; i < n; i++) out[i] = mulmod(&f, a[i], b[i]);
}

// ----- Poseidon2 -----

struct P3Poseidon2 {
  P3Field f;
  int width;
  int sbox_deg;
  int rf;
  int rp;
  std::vector<uint32_t> rc_ext;  // rf * width, canonical
  std::vector<uint32_t> rc_int;  // rp, canonical
  std::vector<uint32_t> diag;    // width, canonical
};

void* p3n_poseidon2_new(uint32_t p, uint32_t np, uint32_t r2, int width,
                        int sbox_deg, int rf, int rp, const uint32_t* rc_ext,
                        const uint32_t* rc_int, const uint32_t* diag) {
  auto* h = new P3Poseidon2();
  h->f = P3Field{p, np, r2};
  h->width = width;
  h->sbox_deg = sbox_deg;
  h->rf = rf;
  h->rp = rp;
  h->rc_ext.assign(rc_ext, rc_ext + (size_t)rf * width);
  h->rc_int.assign(rc_int, rc_int + rp);
  h->diag.assign(diag, diag + width);
  return h;
}

void p3n_poseidon2_free(void* handle) {
  delete static_cast<P3Poseidon2*>(handle);
}

static inline uint32_t sbox(const P3Poseidon2* h, uint32_t x) {
  const P3Field* f = &h->f;
  uint32_t x2 = mulmod(f, x, x);
  if (h->sbox_deg == 3) return mulmod(f, x2, x);
  if (h->sbox_deg == 5) return mulmod(f, mulmod(f, x2, x2), x);
  uint32_t x4 = mulmod(f, x2, x2);
  return mulmod(f, mulmod(f, x4, x2), x);  // x^7
}

static void m4(const P3Field* f, uint32_t* c) {
  // [[2,3,1,1],[1,2,3,1],[1,1,2,3],[3,1,1,2]]
  uint32_t x0 = c[0], x1 = c[1], x2 = c[2], x3 = c[3];
  uint32_t t01 = addmod(f, x0, x1);
  uint32_t t23 = addmod(f, x2, x3);
  uint32_t t0123 = addmod(f, t01, t23);
  uint32_t t01123 = addmod(f, t0123, x1);
  uint32_t t01233 = addmod(f, t0123, x3);
  c[3] = addmod(f, t01233, addmod(f, x0, x0));
  c[1] = addmod(f, t01123, addmod(f, x2, x2));
  c[0] = addmod(f, t01123, t01);
  c[2] = addmod(f, t01233, t23);
}

static void ext_layer(const P3Poseidon2* h, uint32_t* s) {
  const P3Field* f = &h->f;
  int w = h->width;
  for (int g = 0; g < w; g += 4) m4(f, s + g);
  uint32_t sums[4];
  for (int j = 0; j < 4; j++) {
    sums[j] = 0;
    for (int g = 0; g < w; g += 4) sums[j] = addmod(f, sums[j], s[g + j]);
  }
  for (int g = 0; g < w; g += 4)
    for (int j = 0; j < 4; j++) s[g + j] = addmod(f, s[g + j], sums[j]);
}

static void int_layer(const P3Poseidon2* h, uint32_t* s) {
  const P3Field* f = &h->f;
  int w = h->width;
  uint32_t tot = 0;
  for (int j = 0; j < w; j++) tot = addmod(f, tot, s[j]);
  for (int j = 0; j < w; j++)
    s[j] = addmod(f, mulmod(f, h->diag[j], s[j]), tot);
}

void p3n_poseidon2_permute(void* handle, uint32_t* states, uint64_t n) {
  auto* h = static_cast<P3Poseidon2*>(handle);
  const P3Field* f = &h->f;
  int w = h->width;
  int rf2 = h->rf / 2;
#pragma omp parallel for schedule(static) if (n > 256)
  for (uint64_t i = 0; i < n; i++) {
    uint32_t* s = states + i * w;
    ext_layer(h, s);
    for (int r = 0; r < rf2; r++) {
      for (int j = 0; j < w; j++)
        s[j] = sbox(h, addmod(f, s[j], h->rc_ext[(size_t)r * w + j]));
      ext_layer(h, s);
    }
    for (int r = 0; r < h->rp; r++) {
      s[0] = sbox(h, addmod(f, s[0], h->rc_int[r]));
      int_layer(h, s);
    }
    for (int r = rf2; r < h->rf; r++) {
      for (int j = 0; j < w; j++)
        s[j] = sbox(h, addmod(f, s[j], h->rc_ext[(size_t)r * w + j]));
      ext_layer(h, s);
    }
  }
}

void p3n_poseidon2_permute_rows(void* handle, const uint32_t* states,
                                uint32_t* out, uint64_t n) {
  // out: (n, 2 + rf + rp, w) — row 0 raw input, row 1 after the initial
  // external layer, then one row per round (mirrors permute_with_rows)
  auto* h = static_cast<P3Poseidon2*>(handle);
  const P3Field* f = &h->f;
  int w = h->width;
  int rf2 = h->rf / 2;
  int rpp = 2 + h->rf + h->rp;
#pragma omp parallel for schedule(static) if (n > 256)
  for (uint64_t i = 0; i < n; i++) {
    uint32_t s[64];
    const uint32_t* in = states + i * w;
    uint32_t* o = out + i * (uint64_t)rpp * w;
    for (int j = 0; j < w; j++) s[j] = in[j];
    for (int j = 0; j < w; j++) o[j] = s[j];
    o += w;
    ext_layer(h, s);
    for (int j = 0; j < w; j++) o[j] = s[j];
    o += w;
    for (int r = 0; r < rf2; r++) {
      for (int j = 0; j < w; j++)
        s[j] = sbox(h, addmod(f, s[j], h->rc_ext[(size_t)r * w + j]));
      ext_layer(h, s);
      for (int j = 0; j < w; j++) o[j] = s[j];
      o += w;
    }
    for (int r = 0; r < h->rp; r++) {
      s[0] = sbox(h, addmod(f, s[0], h->rc_int[r]));
      int_layer(h, s);
      for (int j = 0; j < w; j++) o[j] = s[j];
      o += w;
    }
    for (int r = rf2; r < h->rf; r++) {
      for (int j = 0; j < w; j++)
        s[j] = sbox(h, addmod(f, s[j], h->rc_ext[(size_t)r * w + j]));
      ext_layer(h, s);
      for (int j = 0; j < w; j++) o[j] = s[j];
      o += w;
    }
  }
}

void p3n_poseidon2_table_rows(void* handle, const uint32_t* states,
                              const uint32_t* rc_block, int n_sbox,
                              uint32_t* out, uint64_t n) {
  // out: (n, rpp, (1+n_sbox)*w) — per row: state | sbox register blocks
  // (cube, and for x^7 the second register cube^2*t), matching the
  // Poseidon2 table AIR's committed columns.
  auto* h = static_cast<P3Poseidon2*>(handle);
  const P3Field* f = &h->f;
  int w = h->width;
  int rf2 = h->rf / 2;
  int rpp = 2 + h->rf + h->rp;
  int mw = (1 + n_sbox) * w;
#pragma omp parallel for schedule(static) if (n > 256)
  for (uint64_t i = 0; i < n; i++) {
    uint32_t s[64];
    const uint32_t* in = states + i * w;
    uint32_t* base = out + i * (uint64_t)rpp * mw;
    for (int j = 0; j < w; j++) s[j] = in[j];
    int row = 0;
    auto emit = [&](void) {
      uint32_t* o = base + (uint64_t)row * mw;
      const uint32_t* rc = rc_block + (size_t)row * w;
      for (int j = 0; j < w; j++) {
        o[j] = s[j];
        uint32_t t = addmod(f, s[j], rc[j]);
        uint32_t t2 = mulmod(f, t, t);
        uint32_t c = mulmod(f, t2, t);
        o[w + j] = c;
        if (n_sbox == 2)
          o[2 * w + j] = mulmod(f, mulmod(f, c, c), t);
      }
      row++;
    };
    emit();
    ext_layer(h, s);
    emit();
    for (int r = 0; r < rf2; r++) {
      for (int j = 0; j < w; j++)
        s[j] = sbox(h, addmod(f, s[j], h->rc_ext[(size_t)r * w + j]));
      ext_layer(h, s);
      emit();
    }
    for (int r = 0; r < h->rp; r++) {
      s[0] = sbox(h, addmod(f, s[0], h->rc_int[r]));
      int_layer(h, s);
      emit();
    }
    for (int r = rf2; r < h->rf; r++) {
      for (int j = 0; j < w; j++)
        s[j] = sbox(h, addmod(f, s[j], h->rc_ext[(size_t)r * w + j]));
      ext_layer(h, s);
      emit();
    }
  }
}

// ----- duplex challenger (WIDTH 16, RATE 8) -----

struct P3Challenger {
  P3Poseidon2* perm;
  uint32_t state[16];
  uint32_t input_buf[8];
  int input_len;
  uint32_t output_buf[8];
  int output_len;
};

void* p3n_challenger_new(void* perm_handle) {
  auto* c = new P3Challenger();
  c->perm = static_cast<P3Poseidon2*>(perm_handle);
  std::memset(c->state, 0, sizeof(c->state));
  c->input_len = 0;
  c->output_len = 0;
  return c;
}

void p3n_challenger_free(void* h) { delete static_cast<P3Challenger*>(h); }

static void duplex(P3Challenger* c) {
  for (int i = 0; i < c->input_len; i++) c->state[i] = c->input_buf[i];
  c->input_len = 0;
  p3n_poseidon2_permute(c->perm, c->state, 1);
  for (int i = 0; i < 8; i++) c->output_buf[i] = c->state[i];
  c->output_len = 8;
}

void p3n_challenger_observe(void* h, const uint32_t* vals, uint64_t n) {
  auto* c = static_cast<P3Challenger*>(h);
  for (uint64_t i = 0; i < n; i++) {
    c->output_len = 0;
    c->input_buf[c->input_len++] = vals[i];
    if (c->input_len == 8) duplex(c);
  }
}

void p3n_challenger_sample(void* h, uint32_t* out, uint64_t n) {
  auto* c = static_cast<P3Challenger*>(h);
  for (uint64_t i = 0; i < n; i++) {
    if (c->input_len > 0 || c->output_len == 0) duplex(c);
    // front-pop convention (see stark/challenger.py): first sample is
    // state[0], so D-aligned extension samples coincide with table limbs
    out[i] = c->output_buf[8 - c->output_len];
    c->output_len--;
  }
}

uint64_t p3n_challenger_grind(void* h, int bits, uint64_t start) {
  // finds w with observe(w); sample_bits(bits) == 0, WITHOUT mutating the
  // challenger; caller must then observe the witness + sample.
  auto* c = static_cast<P3Challenger*>(h);
  uint32_t mask = (1u << bits) - 1;
  for (uint64_t w = start;; w++) {
    P3Challenger t = *c;
    uint32_t wv = (uint32_t)(w % c->perm->f.p);
    p3n_challenger_observe(&t, &wv, 1);
    uint32_t s;
    p3n_challenger_sample(&t, &s, 1);
    if ((s & mask) == 0) return w % c->perm->f.p;
  }
}

// ----- circuit ALU executor (the witness-generation hot loop) -----
//
// Executes a contiguous, dependency-ordered run of ALU rows over the
// extension-field witness table: the C++ face of CircuitRunner (the
// reference's runner is Rust; SURVEY.md §2.1 `execute_all`).  Values are
// D-coefficient canonical u32 tuples with binomial reduction x^D = W.
// kinds: 0=add 1=mul 2=muladd 3=bool; solve: 0=out 1=a 2=check.
// Returns -1 on success or the failing row index (conflict/check error).

struct P3ExtField {
  P3Field f;
  int d;
  uint32_t w;  // binomial W
};

static void ext_mul(const P3ExtField* e, const uint32_t* a, const uint32_t* b,
                    uint32_t* out) {
  const P3Field* f = &e->f;
  int d = e->d;
  uint32_t lo[16] = {0}, hi[16] = {0};
  for (int i = 0; i < d; i++)
    for (int j = 0; j < d; j++) {
      uint32_t t = mulmod(f, a[i], b[j]);
      int k = i + j;
      if (k < d)
        lo[k] = addmod(f, lo[k], t);
      else
        hi[k - d] = addmod(f, hi[k - d], t);
    }
  for (int k = 0; k < d; k++)
    out[k] = addmod(f, lo[k], mulmod(f, e->w, hi[k]));
}

static void ext_inv(const P3ExtField* e, const uint32_t* a, uint32_t* out) {
  const P3Field* f = &e->f;
  int d = e->d;
  // conj = prod of frobenius images a^(p^k), k=1..d-1; frobenius scales
  // coeff i by (W^((p-1)/d))^(i*k)
  uint64_t p = f->p;
  if (d == 1) {  // no conjugates: plain Fermat inverse
    uint64_t base = a[0] % p, ex = p - 2, r = 1;
    while (ex) {
      if (ex & 1) r = r * base % p;
      base = base * base % p;
      ex >>= 1;
    }
    out[0] = (uint32_t)r;
    return;
  }
  uint64_t c0 = 1;
  {  // c0 = W^((p-1)/d) via pow
    uint64_t base = e->w % p, ex = (p - 1) / d, r = 1;
    while (ex) {
      if (ex & 1) r = r * base % p;
      base = base * base % p;
      ex >>= 1;
    }
    c0 = r;
  }
  uint32_t conj[16], tmp[16], img[16];
  bool first = true;
  for (int k = 1; k < d; k++) {
    uint64_t ck = 1;
    for (int i = 0; i < d; i++) {
      img[i] = mulmod(f, a[i], (uint32_t)ck);
      // next coefficient scale: ck *= c0^k
      uint64_t step = 1, b2 = c0, ex = k;
      while (ex) {
        if (ex & 1) step = step * b2 % p;
        b2 = b2 * b2 % p;
        ex >>= 1;
      }
      ck = ck * step % p;
    }
    if (first) {
      std::memcpy(conj, img, sizeof(uint32_t) * d);
      first = false;
    } else {
      ext_mul(e, conj, img, tmp);
      std::memcpy(conj, tmp, sizeof(uint32_t) * d);
    }
  }
  ext_mul(e, a, conj, tmp);  // norm in base field at coeff 0
  // base inverse via Fermat
  uint64_t base = tmp[0] % p, ex = p - 2, r = 1;
  while (ex) {
    if (ex & 1) r = r * base % p;
    base = base * base % p;
    ex >>= 1;
  }
  for (int i = 0; i < d; i++) out[i] = mulmod(f, conj[i], (uint32_t)r);
}

int64_t p3n_execute_alu(uint32_t p, uint32_t np_, uint32_t r2, uint32_t w,
                        int d, uint32_t* wit, uint8_t* defined,
                        const uint8_t* kinds, const uint8_t* solves,
                        const int32_t* ra, const int32_t* rb,
                        const int32_t* rc, const int32_t* rout,
                        int64_t n_rows) {
  P3ExtField e{{p, np_, r2}, d, w};
  const P3Field* f = &e.f;
  uint32_t res[16], tmp[16];
  for (int64_t i = 0; i < n_rows; i++) {
    uint32_t* va = wit + (int64_t)ra[i] * d;
    uint32_t* vb = wit + (int64_t)rb[i] * d;
    uint32_t* vc = wit + (int64_t)rc[i] * d;
    uint32_t* vo = wit + (int64_t)rout[i] * d;
    int kind = kinds[i];
    int solve = solves[i];
    if (kind == 3) {  // bool check on a
      ext_mul(&e, va, va, res);
      for (int j = 0; j < d; j++)
        if (res[j] != va[j]) return i;
      continue;
    }
    if (solve == 1) {  // solve slot a
      if (kind == 0) {  // a = out - b
        for (int j = 0; j < d; j++) res[j] = submod(f, vo[j], vb[j]);
      } else {  // a = out / b
        ext_inv(&e, vb, tmp);
        ext_mul(&e, vo, tmp, res);
      }
      uint32_t* tgt = va;
      if (defined[ra[i]]) {
        for (int j = 0; j < d; j++)
          if (tgt[j] != res[j]) return i;
      } else {
        std::memcpy(tgt, res, sizeof(uint32_t) * d);
        defined[ra[i]] = 1;
      }
      continue;
    }
    if (kind == 0) {
      for (int j = 0; j < d; j++) res[j] = addmod(f, va[j], vb[j]);
    } else if (kind == 1) {
      ext_mul(&e, va, vb, res);
    } else {  // muladd
      ext_mul(&e, va, vb, res);
      for (int j = 0; j < d; j++) res[j] = addmod(f, res[j], vc[j]);
    }
    if (solve == 0) {
      if (defined[rout[i]]) {
        for (int j = 0; j < d; j++)
          if (vo[j] != res[j]) return i;
      } else {
        std::memcpy(vo, res, sizeof(uint32_t) * d);
        defined[rout[i]] = 1;
      }
    } else {  // check row
      for (int j = 0; j < d; j++)
        if (vo[j] != res[j]) return i;
    }
  }
  return -1;
}

}  // extern "C"
