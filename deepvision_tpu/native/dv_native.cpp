// dv_native: CPU-side hot helpers for the serving engine and doc ingest.
//
// The reference app is pure Python (SURVEY.md §2.1); this library is the
// TPU-native build's C++ runtime surface: batched tokenization feeding the
// engine and the document chunker feeding ingest, both called from Python
// via ctypes (no pybind11 in this image).
//
// Build: g++ -O3 -march=native -shared -fPIC dv_native.cpp -o libdvnative.so

#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Byte-level tokenization (ids 0..255 raw bytes, 256=BOS, 257=EOS, 258=PAD)
// ---------------------------------------------------------------------------

// Encode a batch of UTF-8 strings into int32 ids.
//   texts:    n zero-terminated strings
//   out:      [n, out_stride] int32 buffer (caller-allocated)
//   lens:     [n] int32 output lengths (clamped to out_stride)
// Returns 0 on success.
int dv_encode_batch(const char** texts, int n, int add_bos,
                    int32_t* out, int out_stride, int32_t* lens) {
  if (!texts || !out || !lens || n < 0 || out_stride <= 0) return -1;
  for (int i = 0; i < n; ++i) {
    const unsigned char* s =
        reinterpret_cast<const unsigned char*>(texts[i] ? texts[i] : "");
    int32_t* row = out + static_cast<int64_t>(i) * out_stride;
    int pos = 0;
    if (add_bos && pos < out_stride) row[pos++] = 256;
    for (; *s && pos < out_stride; ++s) row[pos++] = static_cast<int32_t>(*s);
    lens[i] = pos;
  }
  return 0;
}

// Decode int32 ids back to UTF-8 bytes (ids >= 256 skipped).
//   ids: [n] input; out: caller buffer of size out_cap; returns bytes written.
int dv_decode(const int32_t* ids, int n, char* out, int out_cap) {
  if (!ids || !out) return -1;
  int w = 0;
  for (int i = 0; i < n && w < out_cap; ++i) {
    if (ids[i] >= 0 && ids[i] < 256) out[w++] = static_cast<char>(ids[i]);
  }
  return w;
}

// ---------------------------------------------------------------------------
// Greedy BPE over byte ids (GPT-2-style rank merges).
// merges: [n_merges, 2] int32 pairs; merged id = 259 + merge index.
// ---------------------------------------------------------------------------

int dv_bpe_encode(const char* text, const int32_t* merges, int n_merges,
                  int add_bos, int32_t* out, int out_cap) {
  if (!text || !out) return -1;
  std::vector<int32_t> ids;
  ids.reserve(strlen(text) + 1);
  if (add_bos) ids.push_back(256);
  for (const unsigned char* s =
           reinterpret_cast<const unsigned char*>(text);
       *s; ++s)
    ids.push_back(static_cast<int32_t>(*s));

  if (n_merges > 0 && merges) {
    std::unordered_map<int64_t, int32_t> rank;
    rank.reserve(n_merges * 2);
    for (int m = 0; m < n_merges; ++m) {
      int64_t key = (static_cast<int64_t>(merges[2 * m]) << 32) |
                    static_cast<uint32_t>(merges[2 * m + 1]);
      rank.emplace(key, m);
    }
    // repeat: find lowest-rank adjacent pair, merge, until none.
    while (ids.size() >= 2) {
      int best_rank = n_merges;
      size_t best_pos = 0;
      for (size_t i = 0; i + 1 < ids.size(); ++i) {
        int64_t key = (static_cast<int64_t>(ids[i]) << 32) |
                      static_cast<uint32_t>(ids[i + 1]);
        auto it = rank.find(key);
        if (it != rank.end() && it->second < best_rank) {
          best_rank = it->second;
          best_pos = i;
        }
      }
      if (best_rank == n_merges) break;
      ids[best_pos] = 259 + best_rank;
      ids.erase(ids.begin() + best_pos + 1);
    }
  }
  int n_out = static_cast<int>(ids.size() < static_cast<size_t>(out_cap)
                                   ? ids.size()
                                   : out_cap);
  memcpy(out, ids.data(), sizeof(int32_t) * n_out);
  return n_out;
}

// ---------------------------------------------------------------------------
// Document chunking: split UTF-8 markdown into ~chunk_chars pieces at
// paragraph boundaries.  Returns number of chunks; offsets/lengths are in
// BYTES into the original buffer (UTF-8 boundary safe).
// ---------------------------------------------------------------------------

static bool is_utf8_start(unsigned char c) { return (c & 0xC0) != 0x80; }

int dv_chunk_markdown(const char* text, int len, int chunk_chars,
                      int32_t* starts, int32_t* ends, int max_chunks) {
  if (!text || !starts || !ends || max_chunks <= 0) return -1;
  // Approximate chars as bytes/3 for CJK-heavy text; use byte budget 3x.
  int byte_budget = chunk_chars * 3;
  int n = 0;
  int start = 0;
  while (start < len && n < max_chunks) {
    int end = start + byte_budget;
    if (end >= len) {
      end = len;
    } else {
      // walk back to a paragraph break, else newline, else UTF-8 boundary
      int cand = -1;
      for (int i = end; i > start + byte_budget / 2; --i) {
        if (i + 1 < len && text[i] == '\n' && text[i + 1] == '\n') {
          cand = i;
          break;
        }
      }
      if (cand < 0) {
        for (int i = end; i > start + byte_budget / 2; --i) {
          if (text[i] == '\n') {
            cand = i;
            break;
          }
        }
      }
      if (cand > 0) {
        end = cand;
      } else {
        while (end > start &&
               !is_utf8_start(static_cast<unsigned char>(text[end])))
          --end;
      }
    }
    // trim leading whitespace of chunk
    int s = start;
    while (s < end && (text[s] == '\n' || text[s] == ' ' ||
                       text[s] == '\r' || text[s] == '\t'))
      ++s;
    if (s < end) {
      starts[n] = s;
      ends[n] = end;
      ++n;
    }
    start = end;
  }
  return n;
}

// Keyword scoring: count occurrences of each needle in each haystack chunk.
int dv_keyword_score(const char* text, const int32_t* chunk_starts,
                     const int32_t* chunk_ends, int n_chunks,
                     const char** keywords, int n_keywords,
                     int32_t* scores) {
  if (!text || !scores) return -1;
  for (int c = 0; c < n_chunks; ++c) {
    std::string chunk(text + chunk_starts[c],
                      text + chunk_ends[c]);
    int32_t score = 0;
    for (int k = 0; k < n_keywords; ++k) {
      const char* kw = keywords[k];
      if (!kw || !*kw) continue;
      size_t pos = 0;
      while ((pos = chunk.find(kw, pos)) != std::string::npos) {
        ++score;
        pos += strlen(kw);
      }
    }
    scores[c] = score;
  }
  return 0;
}

}  // extern "C"
