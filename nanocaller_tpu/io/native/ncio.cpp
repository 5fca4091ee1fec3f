// ncio: native BAM window decoder for nanocaller_tpu.
//
// Replaces the hot part of the htslib/pysam data path (SURVEY.md §2.3 N1):
// BGZF block inflation + BAM record decode + CIGAR expansion into packed
// event arrays, the exact structure produced by the pure-Python
// pileup/engine.decode_reads bring-up path (which remains as the
// differential-test oracle).
//
// Interface: C API consumed via ctypes (no pybind11 in this image).
// Python resolves the BAI index and passes virtual-offset chunk ranges;
// this library does the byte crunching and returns an opaque handle whose
// arrays Python copies into numpy.
//
// Build: g++ -O3 -march=native -shared -fPIC ncio.cpp -o libncio.so -lz

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

#include <zlib.h>

namespace {

constexpr int FUNMAP = 0x4;

struct Window {
  // per read
  std::vector<int32_t> flags;
  std::vector<int8_t> strand;
  std::vector<int64_t> read_start, read_end;
  std::vector<int8_t> hp;
  std::vector<int64_t> ps;
  std::string qnames;              // concatenated
  std::vector<int64_t> qname_off;  // size n_reads+1
  std::string seqs;                // concatenated (optional)
  std::vector<int64_t> seq_off;    // size n_reads+1
  // aligned-base events (positions fit int32 for any real genome)
  std::vector<int32_t> ev_rid;
  std::vector<int32_t> ev_pos;
  std::vector<int8_t> ev_code;
  std::vector<int32_t> ev_qpos;
  // deletions / insertions
  std::vector<int32_t> del_rid;
  std::vector<int32_t> del_start, del_len;
  std::vector<int32_t> ins_rid;
  std::vector<int32_t> ins_pos, ins_len;
  // per-column base counts over [start, end): 6 channels
  // A,G,T,C,other(aligned),DEL — accumulated during decode so Python
  // never touches per-base event arrays for counting
  std::vector<int32_t> counts;
  int64_t count_start = 0;
  std::string error;
};

// base codes matching pileup/engine.py: A0 G1 T2 C3 other 4, over the
// 4-bit BAM nibble alphabet "=ACMGRSVTWYHKDBN"
const int8_t NIBBLE_CODE[16] = {4, 0, 3, 4, 1, 4, 4, 4, 2, 4, 4, 4, 4, 4, 4, 4};
const char NIBBLE_CHAR[17] = "=ACMGRSVTWYHKDBN";

class BgzfFile {
 public:
  explicit BgzfFile(const char* path) : fp_(fopen(path, "rb")) {}
  ~BgzfFile() {
    if (fp_) fclose(fp_);
  }
  bool ok() const { return fp_ != nullptr; }

  // seek to virtual offset
  bool vseek(uint64_t voff) {
    uint64_t coff = voff >> 16;
    uint32_t within = voff & 0xffff;
    if (coff != block_coff_ || !block_valid_) {
      if (!load_block(coff)) return false;
    }
    if (within > block_.size()) return false;
    within_ = within;
    return true;
  }

  uint64_t vtell() const {
    if (within_ == block_.size() && !block_.empty())
      return next_coff_ << 16;
    return (block_coff_ << 16) | within_;
  }

  // read exactly n bytes; returns false on EOF
  bool read(void* dst, size_t n) {
    uint8_t* out = static_cast<uint8_t*>(dst);
    while (n > 0) {
      if (within_ >= block_.size()) {
        if (!load_block(next_coff_)) return false;
        if (block_.empty()) {
          // empty block (EOF marker) — try next
          if (!load_block(next_coff_)) return false;
          if (block_.empty()) return false;
        }
      }
      size_t take = block_.size() - within_;
      if (take > n) take = n;
      memcpy(out, block_.data() + within_, take);
      within_ += take;
      out += take;
      n -= take;
    }
    return true;
  }

 private:
  bool load_block(uint64_t coff) {
    block_valid_ = false;
    if (fseeko(fp_, coff, SEEK_SET) != 0) return false;
    uint8_t header[18];
    size_t got = fread(header, 1, 18, fp_);
    if (got == 0) return false;  // EOF
    if (got < 18 || header[0] != 0x1f || header[1] != 0x8b) return false;
    uint16_t xlen = header[10] | (header[11] << 8);
    std::vector<uint8_t> extra(xlen);
    memcpy(extra.data(), header + 12, 6);
    if (xlen > 6 && fread(extra.data() + 6, 1, xlen - 6, fp_) != size_t(xlen - 6))
      return false;
    int bsize = -1;
    for (size_t i = 0; i + 4 <= extra.size();) {
      uint8_t si1 = extra[i], si2 = extra[i + 1];
      uint16_t slen = extra[i + 2] | (extra[i + 3] << 8);
      if (si1 == 66 && si2 == 67 && slen == 2) {
        bsize = (extra[i + 4] | (extra[i + 5] << 8)) + 1;
        break;
      }
      i += 4 + slen;
    }
    if (bsize < 0) return false;
    int cdata_len = bsize - xlen - 20;
    std::vector<uint8_t> cdata(cdata_len);
    if (fread(cdata.data(), 1, cdata_len, fp_) != size_t(cdata_len)) return false;
    uint8_t footer[8];
    if (fread(footer, 1, 8, fp_) != 8) return false;
    uint32_t isize = footer[4] | (footer[5] << 8) | (footer[6] << 16) |
                     (uint32_t(footer[7]) << 24);
    block_.resize(isize);
    if (isize > 0) {
      z_stream zs{};
      inflateInit2(&zs, -15);
      zs.next_in = cdata.data();
      zs.avail_in = cdata_len;
      zs.next_out = block_.data();
      zs.avail_out = isize;
      int rc = inflate(&zs, Z_FINISH);
      inflateEnd(&zs);
      if (rc != Z_STREAM_END) return false;
    }
    block_coff_ = coff;
    next_coff_ = coff + bsize;
    within_ = 0;
    block_valid_ = true;
    return true;
  }

  FILE* fp_ = nullptr;
  std::vector<uint8_t> block_;
  uint64_t block_coff_ = 0;
  uint64_t next_coff_ = 0;
  size_t within_ = 0;
  bool block_valid_ = false;
};

int64_t tag_to_int(const uint8_t* p, char typ) {
  switch (typ) {
    case 'c': return *reinterpret_cast<const int8_t*>(p);
    case 'C': return *p;
    case 's': { int16_t v; memcpy(&v, p, 2); return v; }
    case 'S': { uint16_t v; memcpy(&v, p, 2); return v; }
    case 'i': { int32_t v; memcpy(&v, p, 4); return v; }
    case 'I': { uint32_t v; memcpy(&v, p, 4); return v; }
    default: return 0;
  }
}

size_t tag_value_size(char typ, const uint8_t* p, const uint8_t* end) {
  switch (typ) {
    case 'A': case 'c': case 'C': return 1;
    case 's': case 'S': return 2;
    case 'i': case 'I': case 'f': return 4;
    case 'Z': case 'H': {
      const uint8_t* q = p;
      while (q < end && *q) q++;
      return q - p + 1;
    }
    case 'B': {
      if (p + 5 > end) return end - p;
      char sub = char(p[0]);
      uint32_t cnt;
      memcpy(&cnt, p + 1, 4);
      size_t esz = (sub == 'c' || sub == 'C') ? 1 : (sub == 's' || sub == 'S') ? 2 : 4;
      return 5 + size_t(cnt) * esz;
    }
    default: return end - p;  // unknown: consume rest
  }
}

void decode_record(const uint8_t* data, size_t len, int64_t start, int64_t end,
                   int32_t want_rid, int flag_exclude, bool keep_seq,
                   const int64_t* sites, int32_t n_sites, Window* w) {
  if (len < 32) return;
  int32_t ref_id, pos;
  memcpy(&ref_id, data, 4);
  memcpy(&pos, data + 4, 4);
  if (ref_id != want_rid) return;
  uint8_t l_read_name = data[8];
  uint16_t n_cigar;
  memcpy(&n_cigar, data + 12, 2);
  uint16_t flag;
  memcpy(&flag, data + 14, 2);
  int32_t l_seq;
  memcpy(&l_seq, data + 16, 4);
  if (flag & (FUNMAP | flag_exclude)) return;
  if (pos >= end) return;

  size_t off = 32;
  const char* qname = reinterpret_cast<const char*>(data + off);
  off += l_read_name;
  const uint8_t* cigar_p = data + off;
  off += size_t(n_cigar) * 4;
  const uint8_t* seq_p = data + off;
  off += (l_seq + 1) / 2;
  off += l_seq;  // qual

  // reference span check
  int64_t ref_len = 0;
  for (int k = 0; k < n_cigar; k++) {
    uint32_t v;
    memcpy(&v, cigar_p + 4 * k, 4);
    uint32_t op = v & 0xf, l = v >> 4;
    if (op == 0 || op == 2 || op == 3 || op == 7 || op == 8) ref_len += l;
  }
  if (pos + ref_len <= start) return;

  // tags: HP, PS
  int8_t hp = 0;
  int64_t ps = -1;
  {
    const uint8_t* p = data + off;
    const uint8_t* tag_end = data + len;
    while (p + 3 <= tag_end) {
      char t0 = char(p[0]), t1 = char(p[1]), typ = char(p[2]);
      p += 3;
      size_t vsz = tag_value_size(typ, p, tag_end);
      if (t0 == 'H' && t1 == 'P' && typ != 'Z' && typ != 'B' && typ != 'f')
        hp = int8_t(tag_to_int(p, typ));
      if (t0 == 'P' && t1 == 'S' && typ != 'Z' && typ != 'B' && typ != 'f')
        ps = tag_to_int(p, typ);
      p += vsz;
    }
  }

  int32_t rid = int32_t(w->flags.size());
  w->flags.push_back(flag);
  w->strand.push_back((flag & 0x10) ? 1 : 0);
  w->read_start.push_back(pos);
  w->hp.push_back(hp);
  w->ps.push_back(ps);
  w->qnames.append(qname, l_read_name - 1);
  w->qname_off.push_back(int64_t(w->qnames.size()));

  if (keep_seq) {
    size_t base = w->seqs.size();
    w->seqs.resize(base + l_seq);
    for (int i = 0; i < l_seq; i++) {
      uint8_t nib = (i & 1) ? (seq_p[i / 2] & 0xf) : (seq_p[i / 2] >> 4);
      w->seqs[base + i] = NIBBLE_CHAR[nib];
    }
  }
  w->seq_off.push_back(int64_t(w->seqs.size()));

  // CIGAR expansion
  int64_t rpos = pos;
  int32_t qpos = 0;
  for (int k = 0; k < n_cigar; k++) {
    uint32_t v;
    memcpy(&v, cigar_p + 4 * k, 4);
    uint32_t op = v & 0xf;
    int64_t l = v >> 4;
    switch (op) {
      case 0: case 7: case 8: {  // M/=/X
        if (n_sites > 0) {
          // site-filtered mode: emit events only at the given sorted
          // positions (memory stays O(reads × sites), not O(bases))
          const int64_t* lo =
              std::lower_bound(sites, sites + n_sites, rpos);
          for (const int64_t* s = lo; s < sites + n_sites && *s < rpos + l;
               s++) {
            int64_t i = *s - rpos;
            int32_t q = qpos + int32_t(i);
            uint8_t nib = (q & 1) ? (seq_p[q / 2] & 0xf) : (seq_p[q / 2] >> 4);
            w->ev_rid.push_back(rid);
            w->ev_pos.push_back(int32_t(rpos + i));
            w->ev_code.push_back(NIBBLE_CODE[nib]);
            w->ev_qpos.push_back(q);
          }
        } else {
          for (int64_t i = 0; i < l; i++) {
            int32_t q = qpos + int32_t(i);
            uint8_t nib = (q & 1) ? (seq_p[q / 2] & 0xf) : (seq_p[q / 2] >> 4);
            int8_t code = NIBBLE_CODE[nib];
            w->ev_rid.push_back(rid);
            w->ev_pos.push_back(int32_t(rpos + i));
            w->ev_code.push_back(code);
            w->ev_qpos.push_back(q);
            int64_t col = rpos + i - w->count_start;
            if (col >= 0 && size_t(col * 6) < w->counts.size())
              w->counts[col * 6 + code]++;
          }
        }
        rpos += l;
        qpos += int32_t(l);
        break;
      }
      case 1:  // I
        w->ins_rid.push_back(rid);
        w->ins_pos.push_back(int32_t(rpos - 1));
        w->ins_len.push_back(int32_t(l));
        qpos += int32_t(l);
        break;
      case 2:  // D
        w->del_rid.push_back(rid);
        w->del_start.push_back(int32_t(rpos));
        w->del_len.push_back(int32_t(l));
        for (int64_t i = 0; i < l; i++) {
          int64_t col = rpos + i - w->count_start;
          if (col >= 0 && size_t(col * 6) < w->counts.size())
            w->counts[col * 6 + 5]++;
        }
        rpos += l;
        break;
      case 3:  // N
        rpos += l;
        break;
      case 4:  // S
        qpos += int32_t(l);
        break;
      default:
        break;  // H/P
    }
  }
  w->read_end.push_back(rpos);
}

}  // namespace

extern "C" {

// Decode reads in [start, end) of reference `rid` from the given virtual
// offset chunk ranges (pairs of beg,end; n_chunks pairs). A single pair
// (data_start, 0) means "scan until past the region" (no index).
void* ncio_decode(const char* path, int32_t rid, int64_t start, int64_t end,
                  const uint64_t* chunks, int32_t n_chunks,
                  int32_t flag_exclude, int32_t keep_seq,
                  const int64_t* sites, int32_t n_sites) {
  auto* w = new Window();
  w->qname_off.push_back(0);
  w->seq_off.push_back(0);
  w->count_start = start;
  if (n_sites == 0 && end > start && end - start < (int64_t(1) << 31))
    w->counts.assign(size_t(end - start) * 6, 0);
  BgzfFile f(path);
  if (!f.ok()) {
    w->error = "cannot open file";
    return w;
  }
  std::vector<uint8_t> rec;
  for (int c = 0; c < n_chunks; c++) {
    uint64_t cbeg = chunks[2 * c], cend = chunks[2 * c + 1];
    if (!f.vseek(cbeg)) continue;
    while (true) {
      if (cend != 0 && f.vtell() >= cend) break;
      int32_t block_size;
      if (!f.read(&block_size, 4)) goto done;
      if (block_size <= 0 || block_size > (1 << 27)) goto done;
      rec.resize(block_size);
      if (!f.read(rec.data(), block_size)) goto done;
      if (cend == 0) {
        // unindexed scan: stop once past the window on this rid
        int32_t r_rid, r_pos;
        memcpy(&r_rid, rec.data(), 4);
        memcpy(&r_pos, rec.data() + 4, 4);
        if (r_rid > rid || (r_rid == rid && r_pos >= end)) goto done;
      }
      decode_record(rec.data(), rec.size(), start, end, rid, flag_exclude,
                    keep_seq != 0, sites, n_sites, w);
    }
  }
done:
  return w;
}

void ncio_sizes(void* handle, int64_t* out) {
  auto* w = static_cast<Window*>(handle);
  out[0] = int64_t(w->flags.size());
  out[1] = int64_t(w->ev_rid.size());
  out[2] = int64_t(w->del_rid.size());
  out[3] = int64_t(w->ins_rid.size());
  out[4] = int64_t(w->qnames.size());
  out[5] = int64_t(w->seqs.size());
  out[6] = w->error.empty() ? 0 : 1;
}

void ncio_fill(void* handle, int32_t* flags, int8_t* strand,
               int64_t* read_start, int64_t* read_end, int8_t* hp, int64_t* ps,
               char* qnames, int64_t* qname_off, char* seqs, int64_t* seq_off,
               int32_t* ev_rid, int32_t* ev_pos, int8_t* ev_code,
               int32_t* ev_qpos, int32_t* del_rid, int32_t* del_start,
               int32_t* del_len, int32_t* ins_rid, int32_t* ins_pos,
               int32_t* ins_len) {
  auto* w = static_cast<Window*>(handle);
  auto cp = [](auto& vec, auto* dst) {
    if (!vec.empty()) memcpy(dst, vec.data(), vec.size() * sizeof(vec[0]));
  };
  cp(w->flags, flags);
  cp(w->strand, strand);
  cp(w->read_start, read_start);
  cp(w->read_end, read_end);
  cp(w->hp, hp);
  cp(w->ps, ps);
  if (!w->qnames.empty()) memcpy(qnames, w->qnames.data(), w->qnames.size());
  cp(w->qname_off, qname_off);
  if (!w->seqs.empty()) memcpy(seqs, w->seqs.data(), w->seqs.size());
  cp(w->seq_off, seq_off);
  cp(w->ev_rid, ev_rid);
  cp(w->ev_pos, ev_pos);
  cp(w->ev_code, ev_code);
  cp(w->ev_qpos, ev_qpos);
  cp(w->del_rid, del_rid);
  cp(w->del_start, del_start);
  cp(w->del_len, del_len);
  cp(w->ins_rid, ins_rid);
  cp(w->ins_pos, ins_pos);
  cp(w->ins_len, ins_len);
}

int64_t ncio_counts_width(void* handle) {
  return int64_t(static_cast<Window*>(handle)->counts.size() / 6);
}

void ncio_counts_fill(void* handle, int32_t* out) {
  auto* w = static_cast<Window*>(handle);
  if (!w->counts.empty())
    memcpy(out, w->counts.data(), w->counts.size() * sizeof(int32_t));
}

void ncio_free(void* handle) { delete static_cast<Window*>(handle); }

// ---------------------------------------------------------------------------
// Batched affine-gap NW with traceback — exact port of align/nw.py
// (same recurrences, same prefix-max horizontal trick, same tie-breaks),
// so cigars are identical to the numpy/JAX paths. Used by feature-worker
// processes, which must not touch JAX.
// ---------------------------------------------------------------------------

namespace {

constexpr int32_t NEG_NW = -(int32_t(1) << 28);

// cigar ops appended as uint32 (len<<4 | op); ops: 7'=', 8'X', 1'I', 2'D'
void nw_align_one(const int8_t* q, int n, const int8_t* r, int m,
                  int match, int mismatch, int gap_open, int gap_extend,
                  std::vector<uint32_t>* cigar_out, int64_t* score_out) {
  // never merge runs across pair boundaries in the shared output vector
  const size_t pair_base = cigar_out->size();
  auto push_op = [&](int op, int l) {
    if (l <= 0) return;
    if (cigar_out->size() > pair_base && int(cigar_out->back() & 0xf) == op)
      cigar_out->back() += uint32_t(l) << 4;
    else
      cigar_out->push_back((uint32_t(l) << 4) | op);
  };
  if (n == 0 && m == 0) { *score_out = 0; return; }
  if (n == 0) { *score_out = -(gap_open + int64_t(m - 1) * gap_extend); push_op(2, m); return; }
  if (m == 0) { *score_out = -(gap_open + int64_t(n - 1) * gap_extend); push_op(1, n); return; }

  // int32 scores (|score| ≤ ~20·len ≪ 2^28) double SIMD width
  std::vector<int32_t> H(m + 1), Hprev(m + 1), V(m + 1, NEG_NW), G(m + 1);
  std::vector<int32_t> c(m + 1), M(m + 1);
  std::vector<uint8_t> tb(size_t(n + 1) * (m + 1), 0);
  H[0] = 0;
  for (int j = 1; j <= m; j++) {
    H[j] = -(gap_open + (j - 1) * gap_extend);
    tb[j] = (j == 1) ? 2 : (2 | 8);
  }
  for (int i = 1; i <= n; i++)
    tb[size_t(i) * (m + 1)] = 1 | (i > 1 ? 4 : 0);

  for (int i = 1; i <= n; i++) {
    Hprev = H;
    int32_t H0i = -(gap_open + (i - 1) * gap_extend);
    G[0] = H0i;
    uint8_t* row = &tb[size_t(i) * (m + 1)];
    int8_t qc = q[i - 1];
    for (int j = 1; j <= m; j++) {
      bool is_match = (qc == r[j - 1]) && qc < 4;
      int32_t diag = Hprev[j - 1] + (is_match ? match : mismatch);
      int32_t vh = Hprev[j] - gap_open;
      int32_t vv = V[j] - gap_extend;
      int32_t Vnew = vh > vv ? vh : vv;
      bool v_ext = vv > vh;
      V[j] = Vnew;
      int32_t g = diag > Vnew ? diag : Vnew;
      G[j] = g;
      row[j] = (Vnew > diag) ? 1 : 0;
      if (v_ext) row[j] |= 4;
    }
    // prefix max of c[j] = G[j] - open + j*ext, then Z[j] = M[j-1] - (j-1)e
    for (int j = 0; j <= m; j++) {
      c[j] = G[j] - gap_open + j * gap_extend;
      M[j] = (j == 0) ? c[0] : (M[j - 1] > c[j] ? M[j - 1] : c[j]);
    }
    H[0] = H0i;
    for (int j = 1; j <= m; j++) {
      int32_t Z = M[j - 1] - (j - 1) * gap_extend;
      bool z_ext = (j >= 2) && (M[j - 2] > c[j - 1]);
      if (Z > G[j]) {
        row[j] = (row[j] & 4) | 2;  // came_z wins; preserve v_ext bit
      }
      if (z_ext) row[j] |= 8;
      H[j] = Z > G[j] ? Z : G[j];
    }
  }
  *score_out = H[m];

  // traceback (identical walk to nw.py)
  std::vector<int> ops;
  int i = n, j = m, state = 0;
  while (i > 0 || j > 0) {
    uint8_t cell = tb[size_t(i) * (m + 1) + j];
    if (state == 0) {
      if (j == 0) { state = 1; continue; }
      if (i == 0) { state = 2; continue; }
      int src = cell & 3;
      if (src == 0) {
        ops.push_back((q[i - 1] == r[j - 1] && q[i - 1] < 4) ? 7 : 8);
        i--; j--;
      } else {
        state = src;
      }
    } else if (state == 1) {
      ops.push_back(1);
      bool ext = cell & 4;
      i--;
      if (!ext) state = 0;
    } else {
      ops.push_back(2);
      bool ext = cell & 8;
      j--;
      if (!ext) state = 0;
    }
  }
  for (auto it = ops.rbegin(); it != ops.rend(); ++it) push_op(*it, 1);
}

struct NwBatch {
  std::vector<uint32_t> cigars;   // concatenated (len<<4|op) runs
  std::vector<int64_t> offsets;   // size n_pairs+1 into cigars
  std::vector<int64_t> scores;
};

}  // namespace

// queries/refs: concatenated int8 code arrays (A0 C1 G2 T3 other4 — the
// align/nw.py encoding); q_off/r_off: n_pairs+1 offsets.
void* ncio_nw_batch(const int8_t* queries, const int64_t* q_off,
                    const int8_t* refs, const int64_t* r_off,
                    int32_t n_pairs, int32_t match, int32_t mismatch,
                    int32_t gap_open, int32_t gap_extend) {
  auto* b = new NwBatch();
  b->offsets.push_back(0);
  b->scores.resize(n_pairs);
  for (int k = 0; k < n_pairs; k++) {
    nw_align_one(queries + q_off[k], int(q_off[k + 1] - q_off[k]),
                 refs + r_off[k], int(r_off[k + 1] - r_off[k]),
                 match, mismatch, gap_open, gap_extend,
                 &b->cigars, &b->scores[k]);
    b->offsets.push_back(int64_t(b->cigars.size()));
  }
  return b;
}

void ncio_nw_sizes(void* handle, int64_t* out) {
  auto* b = static_cast<NwBatch*>(handle);
  out[0] = int64_t(b->scores.size());
  out[1] = int64_t(b->cigars.size());
}

void ncio_nw_fill(void* handle, uint32_t* cigars, int64_t* offsets,
                  int64_t* scores) {
  auto* b = static_cast<NwBatch*>(handle);
  if (!b->cigars.empty())
    memcpy(cigars, b->cigars.data(), b->cigars.size() * 4);
  memcpy(offsets, b->offsets.data(), b->offsets.size() * 8);
  if (!b->scores.empty())
    memcpy(scores, b->scores.data(), b->scores.size() * 8);
}

void ncio_nw_free(void* handle) { delete static_cast<NwBatch*>(handle); }

}  // extern "C"

// ---------------------------------------------------------------------------
// Star-MSA column projection + indel tensor (align/msa.py fast path).
//
// Bit-identical port of project_alignments + msa_tensor (align/msa.py:83-160
// here; formula source: reference generate_indel_pileups.py:53-73): given
// per-read global-alignment cigars vs the reference window, lay out MSA
// columns (per-anchor insertion blocks before each ref column, insertions
// left-aligned), accumulate per-column base counts, and emit the
// (5,width,2) float32 tensor (ch0 = col frequency - ref one-hot,
// ch1 = ref one-hot) plus the -0.01-nudged argmax consensus (gaps removed).
// Codes use the MSA alphabet A0 G1 T2 C3 gap/other 4.
// ---------------------------------------------------------------------------

namespace {

struct MsaOut {
  std::vector<float> tensor;  // 5*width*2
  std::string cns;
};

}  // namespace

extern "C" {

void* ncio_msa_project(const int8_t* read_codes, const int64_t* read_off,
                       int32_t n_reads, const uint32_t* cigar_runs,
                       const int64_t* cigar_off, const int8_t* ref_codes,
                       int32_t ref_len, int32_t width) {
  const int m = ref_len;
  // pass 1: max insertion length per anchor (0..m)
  std::vector<int32_t> ins_len(m + 1, 0);
  for (int rd = 0; rd < n_reads; rd++) {
    int ri = 0;
    for (int64_t k = cigar_off[rd]; k < cigar_off[rd + 1]; k++) {
      uint32_t run = cigar_runs[k];
      int op = int(run & 0xF), l = int(run >> 4);
      if (op == 0 || op == 7 || op == 8) {
        ri += l;
      } else if (op == 1) {
        if (l > ins_len[ri]) ins_len[ri] = l;
      } else if (op == 2 || op == 3) {
        ri += l;
      }
    }
  }
  // column index of each ref position
  std::vector<int64_t> col_of_ref(m);
  int64_t off = 0;
  for (int j = 0; j < m; j++) {
    off += ins_len[j];
    col_of_ref[j] = off++;
  }
  const int64_t total_cols = off + ins_len[m];

  // per-column counts; every row starts as all-gap
  std::vector<int32_t> counts(size_t(total_cols) * 5, 0);
  for (int64_t c = 0; c < total_cols; c++) counts[c * 5 + 4] = n_reads;
  auto put = [&](int64_t col, int8_t code) {
    int b = (code >= 0 && code < 5) ? code : 4;
    counts[col * 5 + 4]--;
    counts[col * 5 + b]++;
  };
  for (int rd = 0; rd < n_reads; rd++) {
    const int8_t* q = read_codes + read_off[rd];
    int qi = 0, ri = 0;
    for (int64_t k = cigar_off[rd]; k < cigar_off[rd + 1]; k++) {
      uint32_t run = cigar_runs[k];
      int op = int(run & 0xF), l = int(run >> 4);
      if (op == 0 || op == 7 || op == 8) {
        for (int t = 0; t < l; t++) put(col_of_ref[ri + t], q[qi + t]);
        qi += l;
        ri += l;
      } else if (op == 1) {
        int64_t start = (ri < m) ? col_of_ref[ri] - ins_len[ri]
                                 : total_cols - ins_len[m];
        for (int t = 0; t < l; t++) put(start + t, q[qi + t]);
        qi += l;
      } else if (op == 2 || op == 3) {
        ri += l;
      } else if (op == 4) {
        qi += l;
      }
    }
  }

  auto* out = new MsaOut();
  out->tensor.assign(size_t(5) * width * 2, 0.0f);
  out->cns.reserve(total_cols);
  static const char REV[] = "AGTC-";
  for (int64_t c = 0; c < total_cols; c++) {
    const int32_t* cc = &counts[c * 5];
    int32_t total = 0;
    for (int b = 0; b < 5; b++) total += cc[b];
    float freq[5];
    for (int b = 0; b < 5; b++)
      freq[b] = float(cc[b]) / float(total);  // matches numpy f32 divide
    // consensus: argmax with -0.01 nudge against '-', first max wins
    // (numpy tmp[:,4] -= 0.01 then argmax, align/msa.py:151-153)
    float best = freq[0];
    int best_b = 0;
    for (int b = 1; b < 5; b++) {
      float v = (b == 4) ? freq[4] - 0.01f : freq[b];
      if (v > best) {
        best = v;
        best_b = b;
      }
    }
    if (best_b != 4) out->cns.push_back(REV[best_b]);
  }
  // ref one-hot per column: '-' except at col_of_ref[j]
  std::vector<int8_t> ref_col(total_cols, 4);
  for (int j = 0; j < m; j++) {
    int8_t rb = ref_codes[j];
    ref_col[col_of_ref[j]] = (rb >= 0 && rb < 5) ? rb : 4;
  }
  const int64_t ncols_t = total_cols < width ? total_cols : width;
  for (int64_t c = 0; c < ncols_t; c++) {
    const int32_t* cc = &counts[c * 5];
    int32_t total = 0;
    for (int b = 0; b < 5; b++) total += cc[b];
    for (int b = 0; b < 5; b++) {
      float freq = float(cc[b]) / float(total);
      float ref_oh = (ref_col[c] == b) ? 1.0f : 0.0f;
      out->tensor[(size_t(b) * width + c) * 2 + 0] = freq - ref_oh;
      out->tensor[(size_t(b) * width + c) * 2 + 1] = ref_oh;
    }
  }
  return out;
}

void ncio_msa_sizes(void* handle, int64_t* out) {
  auto* o = static_cast<MsaOut*>(handle);
  out[0] = int64_t(o->cns.size());
}

void ncio_msa_fill(void* handle, float* tensor, char* cns) {
  auto* o = static_cast<MsaOut*>(handle);
  memcpy(tensor, o->tensor.data(), o->tensor.size() * sizeof(float));
  if (!o->cns.empty()) memcpy(cns, o->cns.data(), o->cns.size());
}

void ncio_msa_free(void* handle) { delete static_cast<MsaOut*>(handle); }

}  // extern "C"

// ---------------------------------------------------------------------------
// rANS 4x8 decoder (CRAM 3.0 block method 4) — C++ fast path for
// io/rans.py (same stream format; that module is the oracle + encoder).
// ---------------------------------------------------------------------------

namespace {

constexpr uint32_t RANS_L = 1u << 23;
constexpr int TF_SHIFT = 12;
constexpr uint32_t TOTFREQ = 1u << TF_SHIFT;

struct FreqTable {
  uint16_t freq[256] = {0};
  uint16_t cum[257] = {0};
  uint8_t lut[TOTFREQ];  // f -> symbol
  void finalize() {
    uint32_t x = 0;
    for (int s = 0; s < 256; s++) {
      cum[s] = uint16_t(x);
      if (freq[s]) {
        memset(lut + x, s, freq[s]);
        x += freq[s];
      }
    }
    cum[256] = uint16_t(x);
  }
};

// read one (sym -> payload) keyed table with the CRAM run-collapsing
// scheme; calls payload(sym) which must advance *pos
template <typename F>
bool read_keyed(const uint8_t* d, int64_t len, int64_t* pos, F payload) {
  if (*pos >= len) return false;
  int rle = 0;
  int key = d[(*pos)++];
  while (true) {
    if (!payload(key)) return false;
    if (rle) {
      rle--;
      key++;
      continue;
    }
    if (*pos >= len) return false;
    int nxt = d[(*pos)++];
    if (nxt == key + 1) {
      if (*pos >= len) return false;
      rle = d[(*pos)++];
    }
    key = nxt;
    if (key == 0 && rle == 0) return true;
  }
}

bool read_freq(const uint8_t* d, int64_t len, int64_t* pos, uint16_t* out) {
  if (*pos >= len) return false;
  uint32_t f = d[(*pos)++];
  if (f >= 128) {
    if (*pos >= len) return false;
    f = ((f & 0x7F) << 8) | d[(*pos)++];
  }
  *out = uint16_t(f);
  return true;
}

bool read_freq_table(const uint8_t* d, int64_t len, int64_t* pos,
                     FreqTable* t) {
  bool ok = read_keyed(d, len, pos, [&](int sym) {
    return read_freq(d, len, pos, &t->freq[sym]);
  });
  if (ok) t->finalize();
  return ok;
}

}  // namespace

extern "C" {

// Decode a full rANS4x8 stream (9-byte header included) into out.
// Returns 0 on success, nonzero on malformed input.
int32_t ncio_rans_uncompress(const uint8_t* in, int64_t in_len,
                             uint8_t* out, int64_t out_capacity,
                             int64_t* out_len) {
  if (in_len < 9) return 1;
  int order = in[0];
  uint32_t raw_sz;
  memcpy(&raw_sz, in + 5, 4);
  *out_len = raw_sz;
  if (raw_sz == 0) return 0;
  if (int64_t(raw_sz) > out_capacity) return 2;
  int64_t pos = 9;

  auto renorm = [&](uint32_t& x) {
    while (x < RANS_L && pos < in_len) x = (x << 8) | in[pos++];
  };

  if (order == 0) {
    FreqTable t;
    if (!read_freq_table(in, in_len, &pos, &t)) return 3;
    if (pos + 16 > in_len) return 3;
    uint32_t R[4];
    memcpy(R, in + pos, 16);
    pos += 16;
    for (int64_t i = 0; i < int64_t(raw_sz); i++) {
      uint32_t& x = R[i & 3];
      uint32_t f = x & (TOTFREQ - 1);
      uint8_t s = t.lut[f];
      out[i] = s;
      x = t.freq[s] * (x >> TF_SHIFT) + f - t.cum[s];
      renorm(x);
    }
    return 0;
  }
  if (order == 1) {
    std::vector<FreqTable> tables(256);
    std::vector<bool> have(256, false);
    bool ok = read_keyed(in, in_len, &pos, [&](int ctx) {
      have[ctx] = true;
      return read_freq_table(in, in_len, &pos, &tables[ctx]);
    });
    if (!ok) return 3;
    if (pos + 16 > in_len) return 3;
    uint32_t R[4];
    memcpy(R, in + pos, 16);
    pos += 16;
    const int64_t isz4 = int64_t(raw_sz) >> 2;
    uint8_t last[4] = {0, 0, 0, 0};
    for (int64_t i = 0; i < isz4; i++) {
      for (int j = 0; j < 4; j++) {
        uint32_t& x = R[j];
        const FreqTable& t = tables[last[j]];
        uint32_t f = x & (TOTFREQ - 1);
        uint8_t s = t.lut[f];
        out[j * isz4 + i] = s;
        x = t.freq[s] * (x >> TF_SHIFT) + f - t.cum[s];
        renorm(x);
        last[j] = s;
      }
    }
    for (int64_t p = 4 * isz4; p < int64_t(raw_sz); p++) {
      uint32_t& x = R[3];
      const FreqTable& t = tables[last[3]];
      uint32_t f = x & (TOTFREQ - 1);
      uint8_t s = t.lut[f];
      out[p] = s;
      x = t.freq[s] * (x >> TF_SHIFT) + f - t.cum[s];
      renorm(x);
      last[3] = s;
    }
    return 0;
  }
  return 4;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// rANS 4x8 encoder — byte-identical to io/rans.py compress() (same
// normalization and table serialization), so either side can verify the
// other. Caller provides a sufficiently large output buffer.
// ---------------------------------------------------------------------------

namespace {

void normalize_freqs(const int64_t* counts, uint16_t* freqs) {
  int64_t total = 0;
  for (int s = 0; s < 256; s++) total += counts[s];
  memset(freqs, 0, 256 * sizeof(uint16_t));
  if (total == 0) return;
  int64_t assigned = 0;
  int max_sym = 0;
  for (int s = 0; s < 256; s++) {
    if (!counts[s]) continue;
    int64_t f = counts[s] * TOTFREQ / total;
    if (f == 0) f = 1;
    freqs[s] = uint16_t(f);
    assigned += f;
    if (freqs[s] > freqs[max_sym] || freqs[max_sym] == 0) max_sym = s;
  }
  freqs[max_sym] = uint16_t(freqs[max_sym] + (int64_t(TOTFREQ) - assigned));
}

void write_freq(std::vector<uint8_t>& out, uint32_t f) {
  if (f < 128) {
    out.push_back(uint8_t(f));
  } else {
    out.push_back(uint8_t(0x80 | (f >> 8)));
    out.push_back(uint8_t(f & 0xFF));
  }
}

// serialize ascending keys with the CRAM run-collapsing scheme
// (mirrors rans.py _write_keyed_table)
template <typename F>
void write_keyed(std::vector<uint8_t>& out, const std::vector<int>& keys,
                 F payload) {
  size_t i = 0, n = keys.size();
  out.push_back(uint8_t(keys[0]));
  int run_left = 0;
  while (true) {
    payload(keys[i]);
    i++;
    if (run_left) {
      run_left--;
      continue;
    }
    if (i < n) {
      out.push_back(uint8_t(keys[i]));
      if (keys[i] == keys[i - 1] + 1) {
        size_t j = i;
        while (j + 1 < n && keys[j + 1] == keys[j] + 1) j++;
        run_left = int(j - i);
        out.push_back(uint8_t(run_left));
      }
    } else {
      out.push_back(0);
      return;
    }
  }
}

void write_freq_table(std::vector<uint8_t>& out, const uint16_t* freqs) {
  std::vector<int> syms;
  for (int s = 0; s < 256; s++)
    if (freqs[s]) syms.push_back(s);
  write_keyed(out, syms, [&](int s) { write_freq(out, freqs[s]); });
}

struct EncState {
  uint32_t R[4] = {RANS_L, RANS_L, RANS_L, RANS_L};
  std::vector<uint8_t> rev;  // renorm bytes, reversed at the end

  inline void put(int j, uint32_t f, uint32_t c) {
    uint32_t x = R[j];
    const uint32_t x_max = ((RANS_L >> TF_SHIFT) << 8) * f;
    while (x >= x_max) {
      rev.push_back(uint8_t(x & 0xFF));
      x >>= 8;
    }
    R[j] = ((x / f) << TF_SHIFT) + c + (x % f);
  }

  void flush(std::vector<uint8_t>& out) {
    for (int j = 0; j < 4; j++) {
      uint32_t v = R[j];
      out.push_back(uint8_t(v));
      out.push_back(uint8_t(v >> 8));
      out.push_back(uint8_t(v >> 16));
      out.push_back(uint8_t(v >> 24));
    }
    out.insert(out.end(), rev.rbegin(), rev.rend());
  }
};

}  // namespace

extern "C" {

// Returns 0 on success; out buffer must hold the worst case
// (in_len + tables + 9; 260k covers order-1 tables).
int32_t ncio_rans_compress(const uint8_t* in, int64_t in_len, int32_t order,
                           uint8_t* out, int64_t out_capacity,
                           int64_t* out_len) {
  if (order == 1 && in_len < 4) order = 0;
  std::vector<uint8_t> body;
  if (in_len > 0 && order == 0) {
    int64_t counts[256] = {0};
    for (int64_t i = 0; i < in_len; i++) counts[in[i]]++;
    uint16_t freqs[256];
    normalize_freqs(counts, freqs);
    uint16_t cum[257] = {0};
    for (int s = 0; s < 256; s++) cum[s + 1] = cum[s] + freqs[s];
    write_freq_table(body, freqs);
    EncState st;
    for (int64_t i = in_len - 1; i >= 0; i--) {
      uint8_t s = in[i];
      st.put(int(i & 3), freqs[s], cum[s]);
    }
    st.flush(body);
  } else if (in_len > 0) {  // order 1
    const int64_t isz4 = in_len >> 2;
    std::vector<std::vector<int64_t>> counts(256);
    auto bump = [&](int ctx, uint8_t s) {
      if (counts[ctx].empty()) counts[ctx].assign(256, 0);
      counts[ctx][s]++;
    };
    for (int j = 0; j < 4; j++) {
      int64_t seg_start = j * isz4;
      int64_t seg_end = (j < 3) ? (j + 1) * isz4 : in_len;
      int ctx = 0;
      for (int64_t p = seg_start; p < seg_end; p++) {
        bump(ctx, in[p]);
        ctx = in[p];
      }
    }
    std::vector<std::vector<uint16_t>> freqs(256);
    std::vector<std::vector<uint16_t>> cums(256);
    std::vector<int> ctxs;
    for (int c = 0; c < 256; c++) {
      if (counts[c].empty()) continue;
      ctxs.push_back(c);
      freqs[c].resize(256);
      normalize_freqs(counts[c].data(), freqs[c].data());
      cums[c].assign(257, 0);
      for (int s = 0; s < 256; s++)
        cums[c][s + 1] = cums[c][s] + freqs[c][s];
    }
    write_keyed(body, ctxs,
                [&](int c) { write_freq_table(body, freqs[c].data()); });
    EncState st;
    for (int64_t p = in_len - 1; p >= 4 * isz4 - 1 + 1; p--) {
      int ctx = (p > 3 * isz4) ? in[p - 1] : 0;
      uint8_t s = in[p];
      st.put(3, freqs[ctx][s], cums[ctx][s]);
    }
    for (int64_t i = isz4 - 1; i >= 0; i--) {
      for (int j = 3; j >= 0; j--) {
        int64_t p = j * isz4 + i;
        int ctx = (p > j * isz4) ? in[p - 1] : 0;
        uint8_t s = in[p];
        st.put(j, freqs[ctx][s], cums[ctx][s]);
      }
    }
    st.flush(body);
  }
  int64_t total = 9 + int64_t(body.size());
  if (total > out_capacity) return 2;
  out[0] = uint8_t(order);
  uint32_t csz = uint32_t(body.size()), rsz = uint32_t(in_len);
  memcpy(out + 1, &csz, 4);
  memcpy(out + 5, &rsz, 4);
  if (!body.empty()) memcpy(out + 9, body.data(), body.size());
  *out_len = total;
  return 0;
}

}  // extern "C"
