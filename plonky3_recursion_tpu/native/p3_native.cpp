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

// ----- full witness-generation schedule executor -----
//
// Executes the ENTIRE interleaved level schedule of a circuit natively:
// ALU row ranges, chained Poseidon2/Poseidon1 permutation levels (sponge /
// Merkle chaining + CTL input placement + index-sum accumulators),
// ext/bit-decompose hints, recompose packing and packed-Horner NPOs.
// One ctypes call replaces the per-level python dispatch that dominated
// witness generation for recursion-sized circuits (the Fiat-Shamir
// challenger chain alone is thousands of sequential levels).
//
// Segment types: 0 ALU [s,e)   1 chained perm [s,e) (aux = perm slot)
//                2 ext_decompose [s,e)   3 bit_decompose [s,e)
//                4 recompose [s,e)       5 horner [s,e) (aux = K)
// Returns -1 on success, else (type<<48)|index of the failing unit.

static inline bool write_cell(const P3Field* f, uint32_t* wit,
                              uint8_t* defined, int32_t wid, int d,
                              const uint32_t* vals) {
  uint32_t* tgt = wit + (int64_t)wid * d;
  if (defined[wid]) {
    for (int j = 0; j < d; j++)
      if (tgt[j] != vals[j]) return false;
    return true;
  }
  for (int j = 0; j < d; j++) tgt[j] = vals[j];
  defined[wid] = 1;
  return true;
}

int64_t p3n_run_schedule(
    uint32_t p, uint32_t np_, uint32_t r2, uint32_t w_binom, int d,
    uint32_t* wit, uint8_t* defined,
    // ALU flat rows (level-sorted)
    const uint8_t* kinds, const uint8_t* solves, const int32_t* ra,
    const int32_t* rb, const int32_t* rc, const int32_t* rout,
    // schedule
    const int64_t* segs, int64_t n_seg,
    // chained perm calls (global arrays; widths per slot)
    void* const* perm_handles, const int32_t* perm_widths, int n_perms,
    const uint8_t* cflags, const int32_t* chain_ids, const int32_t* in_wids,
    const int32_t* out_wids, const int32_t* sum_outs, const int32_t* cslots,
    int max_limbs,
    const uint8_t* priv_bits, const uint8_t* priv_bits2,
    const uint32_t* priv_sibs, const uint8_t* sib_lens,
    uint32_t* chain_states, int64_t* chain_sums, uint8_t* chain_valid,
    int max_width,
    uint32_t* rec_states, uint8_t* rec_bits, int64_t* rec_sums,
    uint8_t* rec_bits2,
    // hints
    const int32_t* eh_in, const int32_t* eh_out,
    const int32_t* bh_in, const int32_t* bh_meta, const int32_t* bh_out,
    const int64_t* bh_off,
    // recompose
    const int32_t* rc_in, const int32_t* rc_out, const int32_t* rc_slots,
    uint32_t* rc_rec,
    // horner
    const int32_t* h_in, const int32_t* h_out, const int32_t* h_slots,
    uint32_t* h_rec) {
  P3ExtField e{{p, np_, r2}, d, w_binom};
  const P3Field* f = &e.f;
  std::vector<uint32_t> buf;
  for (int64_t si = 0; si < n_seg; si++) {
    int64_t type = segs[si * 4 + 0];
    int64_t s = segs[si * 4 + 1];
    int64_t en = segs[si * 4 + 2];
    int64_t aux = segs[si * 4 + 3];
    if (type == 0) {
      int64_t r = p3n_execute_alu(p, np_, r2, w_binom, d, wit, defined,
                                  kinds + s, solves + s, ra + s, rb + s,
                                  rc + s, rout + s, en - s);
      if (r >= 0) return (0LL << 48) | (s + r);
    } else if (type == 1) {
      void* perm = perm_handles[aux];
      int width = perm_widths[aux];
      int rate = width / 2;
      int n_limbs = width / d;
      int64_t k = en - s;
      buf.assign((size_t)k * width, 0);
      for (int64_t i = 0; i < k; i++) {
        int64_t ci = s + i;
        uint32_t* st = buf.data() + (size_t)i * width;
        uint8_t fl = cflags[ci];
        bool new_start = fl & 1, merkle = fl & 2, arity4 = fl & 4;
        const uint32_t* prev =
            chain_states + (int64_t)chain_ids[ci] * max_width;
        bool valid = chain_valid[chain_ids[ci]];
        if (!new_start) {
          if (!valid) return (1LL << 48) | ci;
          if (arity4) {
          } else if (merkle) {
            for (int j = 0; j < rate; j++) st[j] = prev[j];
          } else {
            for (int j = 0; j < width; j++) st[j] = prev[j];
          }
        }
        int bit = 0, bit2 = 0;
        if (merkle) {
          bit = priv_bits[ci];
          bit2 = priv_bits2[ci];
          const uint32_t* sib = priv_sibs + (int64_t)ci * 24;
          if (arity4) {
            int pos = bit + 2 * bit2;
            int sidx = 0;
            for (int q = 0; q < 4; q++) {
              if (q == pos) {
                for (int j = 0; j < 8; j++) st[8 * q + j] = prev[j];
              } else {
                for (int j = 0; j < 8; j++)
                  st[8 * q + j] = sib[8 * sidx + j];
                sidx++;
              }
            }
          } else {
            int sl = sib_lens[ci];
            for (int j = 0; j < sl; j++) st[rate + j] = sib[j];
          }
        }
        const int32_t* iw = in_wids + (int64_t)ci * max_limbs;
        for (int l = 0; l < n_limbs; l++) {
          if (iw[l] >= 0) {
            const uint32_t* v = wit + (int64_t)iw[l] * d;
            for (int j = 0; j < d; j++) st[l * d + j] = v[j];
          }
        }
        if (merkle && bit && !arity4) {
          uint32_t tmp[32];
          for (int j = 0; j < rate; j++) tmp[j] = st[j];
          for (int j = 0; j < rate; j++) st[j] = st[rate + j];
          for (int j = 0; j < rate; j++) st[rate + j] = tmp[j];
        }
        int64_t sum = 0;
        if (merkle) {
          int64_t ps = valid ? chain_sums[chain_ids[ci]] : 0;
          sum = arity4 ? 4 * ps + bit + 2 * bit2 : 2 * ps + bit;
        }
        // record the input state + flags
        int64_t slot = cslots[ci];
        uint32_t* rs = rec_states + slot * max_width;
        for (int j = 0; j < width; j++) rs[j] = st[j];
        rec_bits[slot] = (uint8_t)bit;
        rec_bits2[slot] = (uint8_t)bit2;
        rec_sums[slot] = sum;
      }
      p3n_poseidon2_permute(perm, buf.data(), k);
      for (int64_t i = 0; i < k; i++) {
        int64_t ci = s + i;
        const uint32_t* out = buf.data() + (size_t)i * width;
        const int32_t* ow = out_wids + (int64_t)ci * max_limbs;
        int n_limbs2 = width / d;
        for (int l = 0; l < n_limbs2; l++)
          if (ow[l] >= 0 &&
              !write_cell(f, wit, defined, ow[l], d, out + l * d))
            return (1LL << 48) | ci;
        int64_t slot = cslots[ci];
        if (sum_outs[ci] >= 0) {
          uint32_t sv[16] = {0};
          sv[0] = (uint32_t)(rec_sums[slot] % p);
          if (!write_cell(f, wit, defined, sum_outs[ci], d, sv))
            return (1LL << 48) | ci;
        }
        uint32_t* cst = chain_states + (int64_t)chain_ids[ci] * max_width;
        for (int j = 0; j < width; j++) cst[j] = out[j];
        chain_sums[chain_ids[ci]] = rec_sums[slot];
        chain_valid[chain_ids[ci]] = 1;
      }
    } else if (type == 2) {  // ext_decompose
      for (int64_t i = s; i < en; i++) {
        const uint32_t* v = wit + (int64_t)eh_in[i] * d;
        for (int j = 0; j < d; j++) {
          uint32_t cell[16] = {0};
          cell[0] = v[j];
          if (!write_cell(f, wit, defined, eh_out[i * d + j], d, cell))
            return (2LL << 48) | i;
        }
      }
    } else if (type == 3) {  // bit_decompose
      for (int64_t i = s; i < en; i++) {
        uint32_t v = wit[(int64_t)bh_in[i] * d];
        const int32_t* outs = bh_out + bh_off[i];
        for (int j = 0; j < bh_meta[i]; j++) {
          uint32_t cell[16] = {0};
          cell[0] = (v >> j) & 1u;
          if (!write_cell(f, wit, defined, outs[j], d, cell))
            return (3LL << 48) | i;
        }
      }
    } else if (type == 4) {  // recompose: out coeff j = input j's coeff 0
      for (int64_t i = s; i < en; i++) {
        uint32_t cell[16];
        for (int j = 0; j < d; j++)
          cell[j] = wit[(int64_t)rc_in[i * d + j] * d];
        if (!write_cell(f, wit, defined, rc_out[i], d, cell))
          return (4LL << 48) | i;
        uint32_t* rr = rc_rec + (int64_t)rc_slots[i] * d;
        for (int j = 0; j < d; j++) rr[j] = cell[j];
      }
    } else if (type == 5) {  // packed horner: out = ((acc·b+c0)·b+c1)...
      int K = (int)aux;
      for (int64_t i = s; i < en; i++) {
        const int32_t* iw = h_in + i * (2 + K);
        uint32_t* rr = h_rec + (int64_t)h_slots[i] * (2 + K) * d;
        for (int l = 0; l < 2 + K; l++) {
          const uint32_t* v = wit + (int64_t)iw[l] * d;
          for (int j = 0; j < d; j++) rr[l * d + j] = v[j];
        }
        uint32_t cur[16], t[16];
        const uint32_t* acc = wit + (int64_t)iw[0] * d;
        const uint32_t* b = wit + (int64_t)iw[1] * d;
        for (int j = 0; j < d; j++) cur[j] = acc[j];
        for (int l = 0; l < K; l++) {
          ext_mul(&e, cur, b, t);
          const uint32_t* c = wit + (int64_t)iw[2 + l] * d;
          for (int j = 0; j < d; j++) cur[j] = addmod(f, t[j], c[j]);
        }
        if (!write_cell(f, wit, defined, h_out[i], d, cur))
          return (5LL << 48) | i;
      }
    }
  }
  return -1;
}

}  // extern "C"
