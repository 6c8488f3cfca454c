// Native host-side text codec for the input pipeline.
//
// The char-encoding path one-hot-encodes every report per batch
// (reference: mimic/utils/text.py:13-34 runs a Python char loop per
// sample — the dominant per-batch host cost at batch 256 × 1024 × 71).
// This C++ kernel writes the one-hot batch directly into a preallocated
// float32 buffer: one pass, no Python objects, ~100× the throughput.
//
// Exposed via ctypes (no pybind11 in this image); see fast_codec.py.

#include <cstdint>
#include <cstring>

extern "C" {

// Build a 256-entry byte→index lookup for the alphabet. Unknown bytes map
// to unk_idx. Returns 0 on success.
void build_lut(const char* alphabet, int32_t alpha_len, int32_t unk_idx,
               int32_t* lut /* [256] */) {
    for (int i = 0; i < 256; ++i) lut[i] = unk_idx;
    for (int i = 0; i < alpha_len; ++i) {
        lut[(unsigned char)alphabet[i]] = i;
    }
}

// One-hot encode a batch of byte strings.
//   texts:   concatenated bytes of all samples
//   offsets: [n+1] start offsets into texts
//   out:     [n, len_seq, alpha_len] float32, zero-initialized by caller
// Semantics of mimic/utils/text.py:13-34: truncate to len_seq; shorter
// sequences get one EOS char then PAD to len_seq; OOV bytes → UNK.
void one_hot_encode_batch(const char* texts, const int64_t* offsets,
                          int64_t n, int64_t len_seq,
                          const int32_t* lut, int32_t alpha_len,
                          int32_t eos_idx, int32_t pad_idx,
                          float* out) {
    for (int64_t s = 0; s < n; ++s) {
        const char* p = texts + offsets[s];
        int64_t len = offsets[s + 1] - offsets[s];
        float* row = out + s * len_seq * alpha_len;
        int64_t upto = len < len_seq ? len : len_seq;
        int64_t t = 0;
        for (; t < upto; ++t) {
            row[t * alpha_len + lut[(unsigned char)p[t]]] = 1.0f;
        }
        if (t < len_seq) {            // EOS then PAD
            row[t * alpha_len + eos_idx] = 1.0f;
            ++t;
            for (; t < len_seq; ++t) {
                row[t * alpha_len + pad_idx] = 1.0f;
            }
        }
    }
}

// Token-id encode a batch of pre-tokenized id rows is pure numpy; the
// remaining hot host op is gathering image rows from the memmapped store
// into a contiguous batch. memcpy beats numpy fancy-indexing's generic
// iterator for large rows.
void gather_rows_f32(const float* src, const int64_t* indices, int64_t n,
                     int64_t row_elems, float* out) {
    for (int64_t i = 0; i < n; ++i) {
        std::memcpy(out + i * row_elems, src + indices[i] * row_elems,
                    row_elems * sizeof(float));
    }
}

}  // extern "C"
