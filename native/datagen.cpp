// Native synthetic-data generators for mmvae-tpu.
//
// The Python generators (mmvae_tpu/data/synthetic.py) are the reference
// implementation; the CelebA rasterizer and MultiMNIST compositor have
// per-example Python loops that cap generation at ~500/s and ~8k/s.
// This library reimplements those two hot generators in C++ with OpenMP
// over examples, exposed via a C ABI for ctypes
// (mmvae_tpu/data/native.py). Same visual semantics (every attribute
// visibly alters the image; digit glyphs composited with max), own
// deterministic RNG (splitmix64-seeded xoshiro256**): a given (seed, n)
// always produces the same data, but it is NOT bit-identical to the
// numpy path -- select with MMVAE_DATAGEN=native.
//
// Build: make -C native    (produces libmmvae_datagen.so)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>

namespace {

// --------------------------------------------------------------- RNG ---

struct Rng {
  uint64_t s[4];

  explicit Rng(uint64_t seed) {
    // splitmix64 expansion of the seed into xoshiro256** state.
    uint64_t x = seed;
    for (int i = 0; i < 4; ++i) {
      x += 0x9e3779b97f4a7c15ULL;
      uint64_t z = x;
      z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ULL;
      z = (z ^ (z >> 27)) * 0x94d049bb133111ebULL;
      s[i] = z ^ (z >> 31);
    }
  }

  static uint64_t rotl(uint64_t v, int k) {
    return (v << k) | (v >> (64 - k));
  }

  uint64_t next() {
    const uint64_t result = rotl(s[1] * 5, 7) * 9;
    const uint64_t t = s[1] << 17;
    s[2] ^= s[0];
    s[3] ^= s[1];
    s[1] ^= s[2];
    s[0] ^= s[3];
    s[2] ^= t;
    s[3] = rotl(s[3], 45);
    return result;
  }

  double uniform() {  // [0, 1)
    return (next() >> 11) * 0x1.0p-53;
  }

  float uniform(float lo, float hi) {
    return lo + static_cast<float>(uniform()) * (hi - lo);
  }

  int64_t randint(int64_t lo, int64_t hi) {  // [lo, hi)
    return lo + static_cast<int64_t>(uniform() * (hi - lo));
  }

  bool have_spare = false;
  float spare = 0.f;

  float normal(float mean, float std) {
    // Box-Muller with spare caching (halves the log/cos/sin calls --
    // noise dominates the rasterizer's cost on this 1-core host).
    if (have_spare) {
      have_spare = false;
      return mean + std * spare;
    }
    double u1 = uniform(), u2 = uniform();
    if (u1 < 1e-12) u1 = 1e-12;
    const double r = std::sqrt(-2.0 * std::log(u1));
    const double a = 6.283185307179586 * u2;
    spare = static_cast<float>(r * std::sin(a));
    have_spare = true;
    return mean + std * static_cast<float>(r * std::cos(a));
  }
};

inline float clip01(float v) { return v < 0.f ? 0.f : (v > 1.f ? 1.f : v); }

// 5x7 digit font, same bitmaps as synthetic.py.
const uint32_t kDigitFont[10][7] = {
    {0b01110, 0b10001, 0b10011, 0b10101, 0b11001, 0b10001, 0b01110},
    {0b00100, 0b01100, 0b00100, 0b00100, 0b00100, 0b00100, 0b01110},
    {0b01110, 0b10001, 0b00001, 0b00110, 0b01000, 0b10000, 0b11111},
    {0b01110, 0b10001, 0b00001, 0b00110, 0b00001, 0b10001, 0b01110},
    {0b00010, 0b00110, 0b01010, 0b10010, 0b11111, 0b00010, 0b00010},
    {0b11111, 0b10000, 0b11110, 0b00001, 0b00001, 0b10001, 0b01110},
    {0b01110, 0b10000, 0b11110, 0b10001, 0b10001, 0b10001, 0b01110},
    {0b11111, 0b00001, 0b00010, 0b00100, 0b01000, 0b01000, 0b01000},
    {0b01110, 0b10001, 0b10001, 0b01110, 0b10001, 0b10001, 0b01110},
    {0b01110, 0b10001, 0b10001, 0b01111, 0b00001, 0b00001, 0b01110},
};

}  // namespace

extern "C" {

// MultiMNIST: composite 1..max_digits scaled digit glyphs onto an
// hw x hw canvas; tokens = digits+3 then STOP(2) then PAD(0).
// images: (n, hw, hw) f32; tokens: (n, max_digits+1) i32.
void mmvae_make_multimnist(uint64_t seed, int64_t n, int hw,
                           int max_digits, float* images,
                           int32_t* tokens) {
  // xs[] below is fixed-size; max_digits is caller-controlled through
  // the ctypes ABI, so bound it here (the Python wrapper validates too).
  if (max_digits < 1 || max_digits > 8) return;
  const int scale = 2, gh = 7 * scale, gw = 5 * scale;
  const int seq_len = max_digits + 1;
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    Rng rng(seed * 0x2545F4914F6CDD1DULL + static_cast<uint64_t>(i));
    float* img = images + i * hw * hw;
    std::memset(img, 0, sizeof(float) * hw * hw);
    int32_t* tok = tokens + i * seq_len;
    for (int t = 0; t < seq_len; ++t) tok[t] = 0;  // PAD
    const int k = static_cast<int>(rng.randint(1, max_digits + 1));
    int xs[8];
    for (int d = 0; d < k; ++d)
      xs[d] = static_cast<int>(rng.randint(0, hw - gw + 1));
    std::sort(xs, xs + k);
    for (int d = 0; d < k; ++d) {
      const int digit = static_cast<int>(rng.randint(0, 10));
      const int y0 = static_cast<int>(rng.randint(0, hw - gh + 1));
      for (int r = 0; r < gh; ++r) {
        const uint32_t bits = kDigitFont[digit][r / scale];
        for (int c = 0; c < gw; ++c) {
          if ((bits >> (4 - c / scale)) & 1u) {
            float& px = img[(y0 + r) * hw + xs[d] + c];
            px = std::max(px, 1.0f);
          }
        }
      }
      tok[d] = digit + 3;
    }
    tok[k] = 2;  // STOP
    for (int p = 0; p < hw * hw; ++p)
      img[p] = clip01(img[p] + rng.normal(0.f, 0.02f));
  }
}

// CelebA: 18 binary attributes -> procedural 64x64x3 face; same visual
// feature map as synthetic.py (hair color/style, glasses, mouth, skin,
// face width, ...). images: (n, hw, hw, 3) f32; attrs: (n, 18) f32.
void mmvae_make_celeba(uint64_t seed, int64_t n, int hw, float* images,
                       float* attrs) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    Rng rng(seed * 0x9E3779B97F4A7C15ULL + static_cast<uint64_t>(i));
    float* img = images + i * hw * hw * 3;
    float* a = attrs + i * 18;
    bool at[18];
    for (int j = 0; j < 18; ++j) {
      at[j] = rng.next() & 1u;
      a[j] = at[j] ? 1.f : 0.f;
    }
    // Attribute indices (matching CELEBA_ATTRS in synthetic.py):
    // 0 bangs, 1 black_hair, 2 blond_hair, 3 brown_hair,
    // 4 bushy_eyebrows, 5 chubby, 6 eyeglasses, 7 heavy_makeup,
    // 8 male, 9 mouth_open, 10 mustache, 11 no_beard, 12 pale_skin,
    // 13 receding_hairline, 14 smiling, 15 straight_hair,
    // 16 wavy_hair, 17 young
    float bg[3] = {0.35f, 0.38f, 0.42f};
    if (at[17]) { bg[0] = 0.45f; bg[1] = 0.62f; bg[2] = 0.78f; }
    float skin[3] = {0.78f, 0.62f, 0.50f};
    if (at[12]) { skin[0] = 0.93f; skin[1] = 0.85f; skin[2] = 0.78f; }
    if (at[7]) { skin[0] += 0.05f; skin[1] -= 0.05f; }
    float hair[3] = {0.25f, 0.2f, 0.18f};
    if (at[1]) { hair[0] = 0.08f; hair[1] = 0.07f; hair[2] = 0.07f; }
    else if (at[2]) { hair[0] = 0.85f; hair[1] = 0.72f; hair[2] = 0.35f; }
    else if (at[3]) { hair[0] = 0.42f; hair[1] = 0.26f; hair[2] = 0.13f; }
    const float width = (at[8] ? 0.30f : 0.24f) * (at[5] ? 1.15f : 1.f);
    const float hair_bottom =
        (at[13] ? 0.22f : 0.34f) + (at[0] ? 0.10f : 0.f);
    const float wave = at[16] ? 0.04f : 0.f;
    const float mouth_w = at[14] ? 0.14f : 0.07f;
    const float mouth_h = at[9] ? 0.045f : 0.015f;
    float mouth_col[3] = {0.55f, 0.25f, 0.25f};
    if (at[7]) { mouth_col[0] = 0.8f; mouth_col[1] = 0.1f;
                 mouth_col[2] = 0.2f; }
    const float brow_h = at[4] ? 0.035f : 0.015f;

    for (int r = 0; r < hw; ++r) {
      const float yy = static_cast<float>(r) / (hw - 1);
      for (int c = 0; c < hw; ++c) {
        const float xx = static_cast<float>(c) / (hw - 1);
        float* px = img + (r * hw + c) * 3;
        const float fx = (xx - 0.5f) / width;
        const float fy = (yy - 0.55f) / 0.33f;
        const bool face = fx * fx + fy * fy < 1.f;
        const float* col = face ? skin : bg;
        px[0] = col[0]; px[1] = col[1]; px[2] = col[2];
        if (face) {
          const bool in_hair =
              yy < hair_bottom +
                       wave * std::sin(12.f * 3.14159265f * xx);
          if (in_hair) {
            px[0] = hair[0]; px[1] = hair[1]; px[2] = hair[2];
          }
          const bool eye_x = std::fabs(xx - 0.38f) < 0.05f ||
                             std::fabs(xx - 0.62f) < 0.05f;
          if (yy > 0.47f && yy < 0.52f && eye_x)
            px[0] = px[1] = px[2] = 0.05f;
          if (yy > 0.42f && yy < 0.42f + brow_h && eye_x)
            px[0] = px[1] = px[2] = 0.1f;
          if (at[6]) {  // glasses: frame ring around each eye
            const bool outer =
                (std::fabs(xx - 0.38f) < 0.09f ||
                 std::fabs(xx - 0.62f) < 0.09f) &&
                std::fabs(yy - 0.495f) < 0.06f;
            const bool inner =
                (std::fabs(xx - 0.38f) < 0.07f ||
                 std::fabs(xx - 0.62f) < 0.07f) &&
                std::fabs(yy - 0.495f) < 0.045f;
            if (outer && !inner) px[0] = px[1] = px[2] = 0.02f;
          }
          if (std::fabs(xx - 0.5f) < mouth_w &&
              std::fabs(yy - 0.75f) < mouth_h) {
            px[0] = mouth_col[0]; px[1] = mouth_col[1];
            px[2] = mouth_col[2];
          }
          if (at[10] && std::fabs(xx - 0.5f) < 0.12f &&
              std::fabs(yy - 0.68f) < 0.02f)
            px[0] = px[1] = px[2] = 0.1f;
          if (!at[11] && yy > 0.78f) {
            px[0] *= 0.55f; px[1] *= 0.55f; px[2] *= 0.55f;
          }
        }
        px[0] = clip01(px[0] + rng.normal(0.f, 0.02f));
        px[1] = clip01(px[1] + rng.normal(0.f, 0.02f));
        px[2] = clip01(px[2] + rng.normal(0.f, 0.02f));
      }
    }
  }
}

}  // extern "C"
