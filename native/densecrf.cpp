// Exact dense-CRF mean-field inference with permutohedral-lattice filtering.
//
// Native counterpart of the reference's pydensecrf dependency
// (reference src/imutils.py:439-491 calls the Krähenbühl C++ library through
// python bindings).  This is an independent implementation of the published
// algorithms:
//   * permutohedral lattice approximate high-dimensional Gaussian filtering
//     (Adams, Baek, Davis, "Fast High-Dimensional Filtering Using the
//     Permutohedral Lattice", 2010);
//   * fully-connected CRF mean field with Gaussian edge potentials
//     (Krähenbühl & Koltun, NeurIPS 2011), Potts compatibility, symmetric
//     kernel normalisation.
//
// Exposed as a C ABI for ctypes (muscle_tpu/ops/exact_crf.py).  CPU-side
// post-processing, mirroring where the reference runs its CRF; the XLA
// mean-field path (muscle_tpu/ops/crf.py) is the on-device approximation.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// Permutohedral lattice
// ---------------------------------------------------------------------------
struct VectorKey {
  std::vector<short> k;
  bool operator==(const VectorKey& o) const { return k == o.k; }
};
struct VectorKeyHash {
  size_t operator()(const VectorKey& v) const {
    size_t h = 0;
    for (short x : v.k) h = h * 2531011u + (size_t)(unsigned short)x;
    return h;
  }
};

class Permutohedral {
 public:
  // features: d x n (column-major per point: feature i at features[i*d..])
  void init(const float* features, int d, int n) {
    d_ = d;
    n_ = n;
    offsets_.assign((size_t)(d + 1) * n, 0);
    barycentric_.assign((size_t)(d + 1) * n, 0.f);

    std::vector<float> elevated(d + 1), rem0(d + 1), barycentric(d + 2);
    std::vector<int> rank(d + 1);
    std::vector<short> key(d), canonical((d + 1) * (d + 1));
    // canonical simplex coordinates
    for (int i = 0; i <= d; i++) {
      for (int j = 0; j <= d - i; j++) canonical[i * (d + 1) + j] = (short)i;
      for (int j = d - i + 1; j <= d; j++)
        canonical[i * (d + 1) + j] = (short)(i - (d + 1));
    }

    // scale factors so the Gaussian has unit variance along the lattice:
    // diagonal of the elevation matrix E is sqrt(2/3)*(d+1)/sqrt((i+1)(i+2))
    // (Adams et al. 2010, p.5).
    std::vector<float> scale(d);
    float elev_gain = std::sqrt(2.0f / 3.0f) * (float)(d + 1);
    for (int i = 0; i < d; i++)
      scale[i] = elev_gain / std::sqrt((float)(i + 1) * (i + 2));

    std::unordered_map<VectorKey, int, VectorKeyHash> hash;
    hash.reserve((size_t)n * 2);

    for (int p = 0; p < n; p++) {
      const float* f = features + (size_t)p * d;
      // elevate to H_d (E f)
      float sm = 0;
      for (int j = d; j > 0; j--) {
        float cf = f[j - 1] * scale[j - 1];
        elevated[j] = sm - (float)j * cf;
        sm += cf;
      }
      elevated[0] = sm;

      // nearest remainder-0 lattice point
      float down = 1.0f / (d + 1);
      int sum = 0;
      for (int i = 0; i <= d; i++) {
        float v = elevated[i] * down;
        int up_r = (int)std::ceil(v) * (d + 1);
        int down_r = (int)std::floor(v) * (d + 1);
        rem0[i] = (elevated[i] - down_r < up_r - elevated[i]) ? (float)down_r
                                                              : (float)up_r;
        sum += (int)rem0[i];
      }
      sum /= d + 1;

      // rank differential
      for (int i = 0; i <= d; i++) rank[i] = 0;
      for (int i = 0; i < d; i++) {
        float di = elevated[i] - rem0[i];
        for (int j = i + 1; j <= d; j++) {
          float dj = elevated[j] - rem0[j];
          if (di < dj)
            rank[i]++;
          else
            rank[j]++;
        }
      }
      // fix points outside the canonical simplex
      for (int i = 0; i <= d; i++) {
        rank[i] += sum;
        if (rank[i] < 0) {
          rank[i] += d + 1;
          rem0[i] += (float)(d + 1);
        } else if (rank[i] > d) {
          rank[i] -= d + 1;
          rem0[i] -= (float)(d + 1);
        }
      }

      // barycentric coordinates
      for (int i = 0; i <= d + 1; i++) barycentric[i] = 0;
      for (int i = 0; i <= d; i++) {
        float v = (elevated[i] - rem0[i]) * down;
        barycentric[d - rank[i]] += v;
        barycentric[d + 1 - rank[i]] -= v;
      }
      barycentric[0] += 1.0f + barycentric[d + 1];

      // register the d+1 vertices
      for (int rem = 0; rem <= d; rem++) {
        for (int i = 0; i < d; i++)
          key[i] = (short)(rem0[i] + canonical[rem * (d + 1) + rank[i]]);
        VectorKey vk;
        vk.k.assign(key.begin(), key.end());
        auto it = hash.find(vk);
        int idx;
        if (it == hash.end()) {
          idx = (int)hash.size();
          hash.emplace(std::move(vk), idx);
        } else {
          idx = it->second;
        }
        offsets_[(size_t)p * (d + 1) + rem] = idx;
        barycentric_[(size_t)p * (d + 1) + rem] = barycentric[rem];
      }
    }

    m_ = (int)hash.size();
    // blur neighbour table: for each lattice point and axis, its +/- neighbours
    blur_n1_.assign((size_t)m_ * (d + 1), -1);
    blur_n2_.assign((size_t)m_ * (d + 1), -1);
    std::vector<const VectorKey*> keys(m_);
    for (auto& kv : hash) keys[kv.second] = &kv.first;
    std::vector<short> nk(d);
    for (int j = 0; j <= d; j++) {
      for (int i = 0; i < m_; i++) {
        const std::vector<short>& k0 = keys[i]->k;
        for (int l = 0; l < d; l++) nk[l] = (short)(k0[l] + 1);
        if (j < d) nk[j] = (short)(k0[j] - d);
        VectorKey v1;
        v1.k.assign(nk.begin(), nk.end());
        auto it1 = hash.find(v1);
        for (int l = 0; l < d; l++) nk[l] = (short)(k0[l] - 1);
        if (j < d) nk[j] = (short)(k0[j] + d);
        VectorKey v2;
        v2.k.assign(nk.begin(), nk.end());
        auto it2 = hash.find(v2);
        blur_n1_[(size_t)j * m_ + i] = it1 == hash.end() ? -1 : it1->second;
        blur_n2_[(size_t)j * m_ + i] = it2 == hash.end() ? -1 : it2->second;
      }
    }
  }

  // out = k (x) in ; both n x vd row-major per point
  void compute(float* out, const float* in, int vd) const {
    std::vector<float> values((size_t)(m_ + 2) * vd, 0.f);
    std::vector<float> newvals((size_t)(m_ + 2) * vd, 0.f);

    // splat
    for (int p = 0; p < n_; p++) {
      for (int r = 0; r <= d_; r++) {
        int o = offsets_[(size_t)p * (d_ + 1) + r] + 1;
        float w = barycentric_[(size_t)p * (d_ + 1) + r];
        for (int v = 0; v < vd; v++)
          values[(size_t)o * vd + v] += w * in[(size_t)p * vd + v];
      }
    }

    // blur along each lattice direction
    for (int j = 0; j <= d_; j++) {
      for (int i = 0; i < m_; i++) {
        const float* old = &values[(size_t)(i + 1) * vd];
        float* nv = &newvals[(size_t)(i + 1) * vd];
        int i1 = blur_n1_[(size_t)j * m_ + i];
        int i2 = blur_n2_[(size_t)j * m_ + i];
        const float* v1 = &values[(size_t)(i1 + 1) * vd];
        const float* v2 = &values[(size_t)(i2 + 1) * vd];
        for (int v = 0; v < vd; v++)
          nv[v] = old[v] + 0.5f * (v1[v] + v2[v]);
      }
      values.swap(newvals);
    }

    // slice (with the alternating-blur normalisation 2^-d)
    float alpha = 1.0f / (1 + std::pow(2.0f, -d_));
    for (int p = 0; p < n_; p++) {
      for (int v = 0; v < vd; v++) out[(size_t)p * vd + v] = 0;
      for (int r = 0; r <= d_; r++) {
        int o = offsets_[(size_t)p * (d_ + 1) + r] + 1;
        float w = barycentric_[(size_t)p * (d_ + 1) + r];
        for (int v = 0; v < vd; v++)
          out[(size_t)p * vd + v] += w * values[(size_t)o * vd + v] * alpha;
      }
    }
  }

 private:
  int d_ = 0, n_ = 0, m_ = 0;
  std::vector<int> offsets_;
  std::vector<float> barycentric_;
  std::vector<int> blur_n1_, blur_n2_;
};

// One pairwise kernel with symmetric normalisation + Potts weight.
struct PairwiseKernel {
  Permutohedral lattice;
  std::vector<float> norm;  // n
  float weight;

  void init(const float* features, int d, int n, float w) {
    weight = w;
    lattice.init(features, d, n);
    std::vector<float> ones(n, 1.f);
    norm.assign(n, 0.f);
    lattice.compute(norm.data(), ones.data(), 1);
    for (int i = 0; i < n; i++)
      norm[i] = 1.0f / std::sqrt(norm[i] + 1e-20f);
  }

  // out -= weight-compat applied message (Potts: out += w * filtered)
  void add_message(float* next, const float* q, int n, int l,
                   std::vector<float>& tmp, std::vector<float>& tmp2) const {
    for (int i = 0; i < n; i++)
      for (int v = 0; v < l; v++)
        tmp[(size_t)i * l + v] = q[(size_t)i * l + v] * norm[i];
    lattice.compute(tmp2.data(), tmp.data(), l);
    for (int i = 0; i < n; i++)
      for (int v = 0; v < l; v++)
        next[(size_t)i * l + v] += weight * tmp2[(size_t)i * l + v] * norm[i];
  }
};

void exp_and_normalize(float* q, const float* next, int n, int l) {
  for (int i = 0; i < n; i++) {
    const float* row = next + (size_t)i * l;
    float mx = row[0];
    for (int v = 1; v < l; v++) mx = row[v] > mx ? row[v] : mx;
    float sum = 0;
    for (int v = 0; v < l; v++) {
      float e = std::exp(row[v] - mx);
      q[(size_t)i * l + v] = e;
      sum += e;
    }
    float inv = 1.0f / sum;
    for (int v = 0; v < l; v++) q[(size_t)i * l + v] *= inv;
  }
}

}  // namespace

extern "C" {

// probs: L x H x W class probabilities (softmax), row-major.
// img:   H x W x 3 uint8 RGB.
// out:   L x H x W refined distribution.
// Parameters mirror reference crf_inference defaults
// (sxy_g=3/scale, compat_g=1, sxy_b=32/scale, srgb=10, compat_b=10,
//  confidence=0.5, t iterations).
void muscle_dense_crf(const float* probs, const unsigned char* img, int H,
                      int W, int L, int t, float sxy_g, float compat_g,
                      float sxy_b, float srgb, float compat_b,
                      float confidence, float* out) {
  const int n = H * W;

  // unary_from_softmax(probs, scale=confidence)
  std::vector<float> neg_unary((size_t)n * L);
  for (int v = 0; v < L; v++)
    for (int i = 0; i < n; i++) {
      float p = confidence * probs[(size_t)v * n + i] + (1.0f - confidence) / L;
      neg_unary[(size_t)i * L + v] = std::log(p < 1e-20f ? 1e-20f : p);
    }

  // kernels
  std::vector<float> feat_g((size_t)n * 2), feat_b((size_t)n * 5);
  for (int y = 0; y < H; y++)
    for (int x = 0; x < W; x++) {
      int i = y * W + x;
      feat_g[(size_t)i * 2 + 0] = x / sxy_g;
      feat_g[(size_t)i * 2 + 1] = y / sxy_g;
      feat_b[(size_t)i * 5 + 0] = x / sxy_b;
      feat_b[(size_t)i * 5 + 1] = y / sxy_b;
      feat_b[(size_t)i * 5 + 2] = img[(size_t)i * 3 + 0] / srgb;
      feat_b[(size_t)i * 5 + 3] = img[(size_t)i * 3 + 1] / srgb;
      feat_b[(size_t)i * 5 + 4] = img[(size_t)i * 3 + 2] / srgb;
    }
  PairwiseKernel kg, kb;
  kg.init(feat_g.data(), 2, n, compat_g);
  kb.init(feat_b.data(), 5, n, compat_b);

  // mean field
  std::vector<float> q((size_t)n * L), next((size_t)n * L);
  std::vector<float> tmp((size_t)n * L), tmp2((size_t)n * L);
  exp_and_normalize(q.data(), neg_unary.data(), n, L);
  for (int it = 0; it < t; it++) {
    std::memcpy(next.data(), neg_unary.data(), sizeof(float) * (size_t)n * L);
    kg.add_message(next.data(), q.data(), n, L, tmp, tmp2);
    kb.add_message(next.data(), q.data(), n, L, tmp, tmp2);
    exp_and_normalize(q.data(), next.data(), n, L);
  }

  for (int v = 0; v < L; v++)
    for (int i = 0; i < n; i++) out[(size_t)v * n + i] = q[(size_t)i * L + v];
}

}  // extern "C"
