// Fast _atom_site row extraction for mmCIF preprocessing.
//
// Native accelerator for the Python mmCIF parser
// (se3_diffusion_tpu/data/mmcif.py): given the raw text of an
// `_atom_site` loop's data rows and the column positions of the fields we
// need, tokenizes and filters rows (ATOM records, model 1, altloc ./A)
// and emits packed arrays. The canonical atom37 names and 3-letter
// residue codes are compiled in (they are fixed conventions).
//
// Build: g++ -O3 -std=c++17 -shared -fPIC mmcif_atoms.cc -o libmmcif.so

#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>

namespace {

const char* kAtomTypes[37] = {
    "N", "CA", "C", "CB", "O", "CG", "CG1", "CG2", "OG", "OG1", "SG", "CD",
    "CD1", "CD2", "ND1", "ND2", "OD1", "OD2", "SD", "CE", "CE1", "CE2",
    "CE3", "NE", "NE1", "NE2", "OE1", "OE2", "CH2", "NH1", "NH2", "OH",
    "CZ", "CZ2", "CZ3", "NZ", "OXT"};

const char* kResNames[20] = {"ALA", "ARG", "ASN", "ASP", "CYS", "GLN",
                             "GLU", "GLY", "HIS", "ILE", "LEU", "LYS",
                             "MET", "PHE", "PRO", "SER", "THR", "TRP",
                             "TYR", "VAL"};

const std::unordered_map<std::string, int8_t>& atom_map() {
  static auto* m = [] {
    auto* mm = new std::unordered_map<std::string, int8_t>;
    for (int i = 0; i < 37; ++i) (*mm)[kAtomTypes[i]] = static_cast<int8_t>(i);
    return mm;
  }();
  return *m;
}

const std::unordered_map<std::string, int8_t>& res_map() {
  static auto* m = [] {
    auto* mm = new std::unordered_map<std::string, int8_t>;
    for (int i = 0; i < 20; ++i) (*mm)[kResNames[i]] = static_cast<int8_t>(i);
    (*mm)["MSE"] = 12;  // selenomethionine -> MET
    return mm;
  }();
  return *m;
}

struct Tok {
  const char* p;
  int len;
};

inline bool tok_eq(const Tok& t, const char* s) {
  return static_cast<int>(std::strlen(s)) == t.len &&
         std::memcmp(t.p, s, t.len) == 0;
}

}  // namespace

extern "C" {

// Tokenizes `text` (the data rows of an _atom_site loop), emitting one
// entry per accepted atom. Column indices are 0-based positions of the
// fields within a row (-1 = absent). Output arrays must be sized for the
// worst case (number of rows). Returns the number of emitted atoms, or
// -1 on a malformed row.
long parse_atom_rows(
    const char* text, long text_len, int ncols,
    int col_group, int col_atom, int col_comp, int col_chain, int col_seq,
    int col_x, int col_y, int col_z, int col_b, int col_alt, int col_model,
    int col_icode,
    // outputs
    int32_t* chain_ids,   // hashed chain id (first 4 chars packed)
    int32_t* res_seq,     // encoded auth_seq*64 + icode rank (see below)
    int8_t* atom_idx,
    int8_t* aatype,
    float* xyz,           // [n, 3]
    float* bfac) {
  const auto& amap = atom_map();
  const auto& rmap = res_map();
  long count = 0;
  long i = 0;
  Tok toks[64];
  if (ncols > 64) return -1;

  while (i < text_len) {
    // Tokenize one logical row (ncols whitespace-separated fields,
    // possibly spanning lines).
    int nt = 0;
    while (nt < ncols && i < text_len) {
      while (i < text_len && (text[i] == ' ' || text[i] == '\t' ||
                              text[i] == '\n' || text[i] == '\r'))
        ++i;
      if (i >= text_len) break;
      char quote = 0;
      if (text[i] == '\'' || text[i] == '"') {
        quote = text[i];
        ++i;
      }
      long start = i;
      if (quote) {
        while (i < text_len && text[i] != quote) ++i;
      } else {
        while (i < text_len && text[i] != ' ' && text[i] != '\t' &&
               text[i] != '\n' && text[i] != '\r')
          ++i;
      }
      toks[nt].p = text + start;
      toks[nt].len = static_cast<int>(i - start);
      if (quote && i < text_len) ++i;  // closing quote
      ++nt;
    }
    if (nt == 0) break;
    if (nt < ncols) return -1;

    // Filters (same as the Python parser).
    if (col_group >= 0 && !tok_eq(toks[col_group], "ATOM")) continue;
    if (col_model >= 0) {
      const Tok& t = toks[col_model];
      if (!(tok_eq(t, "1") || tok_eq(t, ".") || tok_eq(t, "?"))) continue;
    }
    if (col_alt >= 0) {
      const Tok& t = toks[col_alt];
      if (!(tok_eq(t, ".") || tok_eq(t, "A") || tok_eq(t, "?"))) continue;
    }
    std::string atom_name(toks[col_atom].p, toks[col_atom].len);
    auto ait = amap.find(atom_name);
    if (ait == amap.end()) continue;
    std::string res_name(toks[col_comp].p, toks[col_comp].len);
    auto rit = rmap.find(res_name);
    int8_t aa = rit == rmap.end() ? static_cast<int8_t>(20) : rit->second;

    // Chain id packed into an int32 (up to 4 chars).
    int32_t cid = 0;
    for (int k = 0; k < toks[col_chain].len && k < 4; ++k)
      cid = (cid << 8) | static_cast<uint8_t>(toks[col_chain].p[k]);

    char buf[32];
    auto to_f = [&](const Tok& t) {
      int len = t.len < 31 ? t.len : 31;
      std::memcpy(buf, t.p, len);
      buf[len] = 0;
      return std::strtof(buf, nullptr);
    };
    auto to_i = [&](const Tok& t) {
      int len = t.len < 31 ? t.len : 31;
      std::memcpy(buf, t.p, len);
      buf[len] = 0;
      return static_cast<int32_t>(std::strtol(buf, nullptr, 10));
    };

    // Insertion code -> rank in [0, 63): '.'/'?'/'' = 0 (no insertion),
    // 'A'..'Z' = 1..26, 'a'..'z' = 27..52. Encoding seq*64 + rank keeps
    // (seq, icode) lexicographic order under integer sort — also for
    // negative auth_seq_id — so insertion-coded residues stay distinct
    // and ordered (base residue first: 100 < 100A < 100B < 101).
    int32_t icode_rank = 0;
    if (col_icode >= 0 && toks[col_icode].len == 1) {
      char c = toks[col_icode].p[0];
      if (c >= 'A' && c <= 'Z') icode_rank = c - 'A' + 1;
      else if (c >= 'a' && c <= 'z') icode_rank = c - 'a' + 27;
    }

    chain_ids[count] = cid;
    res_seq[count] = to_i(toks[col_seq]) * 64 + icode_rank;
    atom_idx[count] = ait->second;
    aatype[count] = aa;
    xyz[count * 3 + 0] = to_f(toks[col_x]);
    xyz[count * 3 + 1] = to_f(toks[col_y]);
    xyz[count * 3 + 2] = to_f(toks[col_z]);
    bfac[count] = col_b >= 0 ? to_f(toks[col_b]) : 0.0f;
    ++count;
  }
  return count;
}
}
