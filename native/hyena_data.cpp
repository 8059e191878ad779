// Native data-path kernels: fused FASTA fetch + newline strip + tokenize +
// reverse-complement + padding, in one pass over mmap'd bytes.
//
// Role: the TPU-native equivalent of the reference's native-code data story.
// The reference's hot device kernel is CUDA (csrc/fftconv) — on TPU that
// becomes XLA/Pallas — but its HOST hot path (pyfaidx fetch + HF per-char
// tokenization, /root/reference/src/dataloaders/datasets/hg38_dataset.py)
// is pure Python and becomes the bottleneck at 1M-token samples. This
// module does the whole sample assembly in C++: byte LUT tokenization
// directly from the genome mmap into the caller's int32 buffer, no
// intermediate strings.
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 dependency).
// Thread-safe after fasta_open(): fetches are read-only on the mmap, so the
// Python loader's prefetch threads can call in parallel (GIL released by
// ctypes during the call).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fcntl.h>
#include <string>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>
#include <unordered_map>
#include <vector>

namespace {

struct Record {
  int64_t length;
  int64_t offset;
  int64_t linebases;
  int64_t linewidth;
};

struct Fasta {
  int fd = -1;
  const uint8_t* data = nullptr;
  size_t size = 0;
  std::unordered_map<std::string, Record> index;
};

// vocab ids mirror hyena_dna_tpu.data.tokenizer (reference
// hg38_char_tokenizer.py:58-68): specials 0-6, A=7 C=8 G=9 T=10 N=11.
constexpr int32_t kPad = 4;
constexpr int32_t kUnk = 6;
constexpr int32_t kSep = 1;

struct Luts {
  int32_t tok[256];
  uint8_t comp[256];
  Luts() {
    for (int i = 0; i < 256; ++i) {
      tok[i] = kUnk;
      comp[i] = static_cast<uint8_t>(i);
    }
    tok['A'] = 7; tok['C'] = 8; tok['G'] = 9; tok['T'] = 10; tok['N'] = 11;
    tok['a'] = kUnk; tok['c'] = kUnk; tok['g'] = kUnk; tok['t'] = kUnk;
    // reference tokenizes the raw string; lowercase are not in the vocab
    // (soft-masked genomes are upper()'d by callers when needed). Keep a
    // second LUT entry set for that mode below.
    comp['A'] = 'T'; comp['T'] = 'A'; comp['C'] = 'G'; comp['G'] = 'C';
    comp['a'] = 't'; comp['t'] = 'a'; comp['c'] = 'g'; comp['g'] = 'c';
  }
};
const Luts kLuts;

struct UpperLuts {
  int32_t tok[256];
  UpperLuts() {
    for (int i = 0; i < 256; ++i) tok[i] = kUnk;
    tok['A'] = tok['a'] = 7;
    tok['C'] = tok['c'] = 8;
    tok['G'] = tok['g'] = 9;
    tok['T'] = tok['t'] = 10;
    tok['N'] = tok['n'] = 11;
  }
};
const UpperLuts kUpperLuts;

bool parse_fai(const std::string& fai_path, Fasta* fa) {
  FILE* f = fopen(fai_path.c_str(), "r");
  if (!f) return false;
  char name[1024];
  long long length, offset, linebases, linewidth;
  while (fscanf(f, "%1023s %lld %lld %lld %lld", name, &length, &offset,
                &linebases, &linewidth) == 5) {
    // consume rest of line (fai may have extra columns)
    int c;
    while ((c = fgetc(f)) != '\n' && c != EOF) {
    }
    fa->index[name] = Record{length, offset, linebases, linewidth};
  }
  fclose(f);
  return !fa->index.empty();
}

}  // namespace

extern "C" {

// Opens a fasta + its .fai index (the Python side builds the .fai if
// missing). Returns an opaque handle or null.
void* fasta_open(const char* path) {
  auto* fa = new Fasta();
  fa->fd = open(path, O_RDONLY);
  if (fa->fd < 0) {
    delete fa;
    return nullptr;
  }
  struct stat st;
  if (fstat(fa->fd, &st) != 0) {
    close(fa->fd);
    delete fa;
    return nullptr;
  }
  fa->size = static_cast<size_t>(st.st_size);
  fa->data = static_cast<const uint8_t*>(
      mmap(nullptr, fa->size, PROT_READ, MAP_SHARED, fa->fd, 0));
  if (fa->data == MAP_FAILED) {
    close(fa->fd);
    delete fa;
    return nullptr;
  }
  if (!parse_fai(std::string(path) + ".fai", fa)) {
    munmap(const_cast<uint8_t*>(fa->data), fa->size);
    close(fa->fd);
    delete fa;
    return nullptr;
  }
  return fa;
}

void fasta_close(void* handle) {
  auto* fa = static_cast<Fasta*>(handle);
  if (!fa) return;
  munmap(const_cast<uint8_t*>(fa->data), fa->size);
  close(fa->fd);
  delete fa;
}

int64_t fasta_length(void* handle, const char* name) {
  auto* fa = static_cast<Fasta*>(handle);
  auto it = fa->index.find(name);
  return it == fa->index.end() ? -1 : it->second.length;
}

// Fused fetch+tokenize:
//   - clips [start, end) to the record, fetches bytes skipping newlines,
//   - tokenizes via LUT (uppercase_mode folds soft-masked lowercase),
//   - optional reverse complement (tokens emitted reversed+complemented),
//   - left-pads with [PAD] to out_len (padding_side_left) or right-pads,
//   - optional trailing [SEP] (add_eos) before padding is applied.
// Writes exactly out_len int32 tokens into out. Returns the number of real
// (non-pad) tokens, or -1 on unknown record.
int64_t fasta_fetch_tokens(void* handle, const char* name, int64_t start,
                           int64_t end, int32_t* out, int64_t out_len,
                           int add_eos, int rc, int pad_left,
                           int uppercase_mode) {
  auto* fa = static_cast<Fasta*>(handle);
  auto it = fa->index.find(name);
  if (it == fa->index.end()) return -1;
  const Record& rec = it->second;
  if (start < 0) start = 0;
  if (end > rec.length) end = rec.length;
  if (end < start) end = start;

  int64_t max_tokens = out_len - (add_eos ? 1 : 0);
  int64_t n = end - start;
  if (n > max_tokens) {
    n = max_tokens;  // truncation keeps the prefix of the FINAL string —
    if (rc) start = end - n;  // for reverse complement that is the suffix
  }

  // gather tokens into a stack/heap scratch in sequence order
  std::vector<int32_t> toks(static_cast<size_t>(n));
  const int32_t* lut = uppercase_mode ? kUpperLuts.tok : kLuts.tok;
  int64_t written = 0;
  int64_t pos = start;
  while (written < n) {
    int64_t line_idx = pos / rec.linebases;
    int64_t in_line = pos % rec.linebases;
    int64_t line_remaining = rec.linebases - in_line;
    int64_t take = n - written;
    if (take > line_remaining) take = line_remaining;
    const uint8_t* src = fa->data + rec.offset + line_idx * rec.linewidth + in_line;
    if (rc) {
      for (int64_t i = 0; i < take; ++i)
        toks[static_cast<size_t>(written + i)] =
            lut[kLuts.comp[src[i]]];
    } else {
      for (int64_t i = 0; i < take; ++i)
        toks[static_cast<size_t>(written + i)] = lut[src[i]];
    }
    written += take;
    pos += take;
  }
  if (rc) {  // reverse for the reverse complement
    for (int64_t i = 0, j = n - 1; i < j; ++i, --j)
      std::swap(toks[static_cast<size_t>(i)], toks[static_cast<size_t>(j)]);
  }

  int64_t real = n + (add_eos ? 1 : 0);
  int64_t pad = out_len - real;
  int32_t* dst = out;
  if (pad_left) {
    for (int64_t i = 0; i < pad; ++i) *dst++ = kPad;
  }
  memcpy(dst, toks.data(), static_cast<size_t>(n) * sizeof(int32_t));
  dst += n;
  if (add_eos) *dst++ = kSep;
  if (!pad_left) {
    for (int64_t i = 0; i < pad; ++i) *dst++ = kPad;
  }
  return real;
}

// Tokenize a raw byte string (for non-fasta datasets): same LUT path.
int64_t tokenize_bytes(const uint8_t* str, int64_t n, int32_t* out,
                       int64_t out_len, int add_eos, int pad_left,
                       int uppercase_mode) {
  int64_t max_tokens = out_len - (add_eos ? 1 : 0);
  if (n > max_tokens) n = max_tokens;
  const int32_t* lut = uppercase_mode ? kUpperLuts.tok : kLuts.tok;
  int64_t real = n + (add_eos ? 1 : 0);
  int64_t pad = out_len - real;
  int32_t* dst = out;
  if (pad_left)
    for (int64_t i = 0; i < pad; ++i) *dst++ = kPad;
  for (int64_t i = 0; i < n; ++i) *dst++ = lut[str[i]];
  if (add_eos) *dst++ = kSep;
  if (!pad_left)
    for (int64_t i = 0; i < pad; ++i) *dst++ = kPad;
  return real;
}

}  // extern "C"
