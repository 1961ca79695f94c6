// Native MAF block tokenizer for the host-side input pipeline.
//
// Streams a MAF file, collects the four requested species' aligned rows per
// block, and emits the 625-symbol column tokens (and optionally the
// reference-coordinate projection) directly into caller-provided buffers.
// This replaces the Python line parser in data/maf.py on the hot ingestion
// path (whole-genome multi-GB MAF files) — the Python implementation remains
// as a portable fallback and as the semantic reference.
//
// C ABI (used from Python via ctypes, see native/__init__.py):
//
//   handle = maf_open(path, species_csv)           // species '.'-prefix match
//   n = maf_next_block(handle, tokens_out, cap, coords_out, ref_idx)
//       -> number of columns, 0 at EOF, -1 on error, -2 buffer too small
//   maf_close(handle)
//
// Tokens use the reference alphabet order (ACTG 4-mers 0..255, then
// N-containing 4-mers; reference read_data.py:6-24); gaps and unknown
// characters map to N.  Blocks missing any species are skipped (tokens);
// coordinate projection (coords_out != nullptr) mirrors
// reference read_data.py:146-220 (gaps/absent reference -> -9).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct SeqRow {
    bool present = false;
    std::string text;
    int64_t start = 0;
    int64_t src_size = 0;
    int strand = 1;
};

struct MafFile {
    FILE* fp = nullptr;
    std::vector<std::string> species;
    int ref_index = -1;  // index into species of the coordinate reference
    std::string line;
    bool pending_block = false;
};

// token lookup: code 0..3 = A,C,T,G; 4 = N; token = lut[a][b][c][d]
int32_t g_lut[5][5][5][5];
uint8_t g_base_code[256];
bool g_tables_ready = false;

void build_tables() {
    if (g_tables_ready) return;
    memset(g_base_code, 4, sizeof(g_base_code));
    const char* alpha = "ACTG";
    for (int i = 0; i < 4; ++i) {
        g_base_code[(unsigned char)alpha[i]] = i;
        g_base_code[(unsigned char)tolower(alpha[i])] = i;
    }
    // unambiguous 4-mers: index a*64+b*16+c*4+d
    for (int a = 0; a < 4; ++a)
        for (int b = 0; b < 4; ++b)
            for (int c = 0; c < 4; ++c)
                for (int d = 0; d < 4; ++d)
                    g_lut[a][b][c][d] = ((a * 4 + b) * 4 + c) * 4 + d;
    // N-containing 4-mers in the reference enumeration order over "ACTGN"
    int next = 256;
    for (int a = 0; a < 5; ++a)
        for (int b = 0; b < 5; ++b)
            for (int c = 0; c < 5; ++c)
                for (int d = 0; d < 5; ++d) {
                    if (a == 4 || b == 4 || c == 4 || d == 4)
                        g_lut[a][b][c][d] = next++;
                }
    g_tables_ready = true;
}

bool read_line(MafFile* mf) {
    char buf[1 << 16];
    mf->line.clear();
    while (fgets(buf, sizeof(buf), mf->fp)) {
        mf->line.append(buf);
        if (!mf->line.empty() && mf->line.back() == '\n') {
            mf->line.pop_back();
            return true;
        }
        if (feof(mf->fp)) return true;
    }
    return !mf->line.empty();
}

}  // namespace

extern "C" {

void* maf_open(const char* path, const char* species_csv, const char* ref) {
    build_tables();
    FILE* fp = fopen(path, "r");
    if (!fp) return nullptr;
    auto* mf = new MafFile();
    mf->fp = fp;
    std::string csv(species_csv);
    size_t pos = 0;
    while (pos != std::string::npos) {
        size_t comma = csv.find(',', pos);
        std::string sp = csv.substr(
            pos, comma == std::string::npos ? std::string::npos : comma - pos);
        if (!sp.empty()) mf->species.push_back(sp);
        pos = comma == std::string::npos ? std::string::npos : comma + 1;
    }
    if (ref && *ref) {
        for (size_t i = 0; i < mf->species.size(); ++i)
            if (mf->species[i] == ref) mf->ref_index = (int)i;
        // a reference outside the species list is appended for matching only
        if (mf->ref_index < 0) {
            mf->species.push_back(ref);
            mf->ref_index = (int)mf->species.size() - 1;
        }
    }
    return mf;
}

// Returns #columns written, 0 at EOF, -1 error, -2 token buffer too small.
// If coords_out is non-null and a reference was given, writes the
// reference-genome coordinate per column (-9 for gaps/absent reference).
int64_t maf_next_block(void* handle, int32_t* tokens_out, int64_t cap,
                       int64_t* coords_out) {
    auto* mf = (MafFile*)handle;
    if (!mf || !mf->fp) return -1;
    const size_t n_tok_species =
        mf->ref_index >= 0 && (size_t)mf->ref_index == mf->species.size() - 1
            ? mf->species.size() - 1
            : mf->species.size();

    while (true) {
        std::vector<SeqRow> rows(mf->species.size());
        bool in_block = false;
        bool saw_any = false;
        long block_end_pos;
        while (true) {
            block_end_pos = ftell(mf->fp);
            if (!read_line(mf)) break;  // EOF
            const std::string& ln = mf->line;
            if (ln.empty()) {
                if (in_block) break;
                continue;
            }
            if (ln[0] == 'a') {
                if (in_block) {
                    fseek(mf->fp, block_end_pos, SEEK_SET);  // un-read
                    break;
                }
                in_block = true;
                continue;
            }
            if (!in_block || ln[0] != 's') continue;
            // s src start size strand srcSize text
            char src[512], strand[8];
            long long start, size, src_size;
            char* text = new char[ln.size() + 1];
            int n = sscanf(ln.c_str(), "s %511s %lld %lld %7s %lld %s", src,
                           &start, &size, strand, &src_size, text);
            if (n == 6) {
                std::string name(src);
                size_t dot = name.find('.');
                if (dot != std::string::npos) name = name.substr(0, dot);
                for (size_t i = 0; i < mf->species.size(); ++i) {
                    if (mf->species[i] == name) {
                        rows[i].present = true;
                        rows[i].text = text;
                        rows[i].start = start;
                        rows[i].src_size = src_size;
                        rows[i].strand = strand[0] == '+' ? 1 : -1;
                        saw_any = true;
                    }
                }
            }
            delete[] text;
        }
        if (!in_block && !saw_any) return 0;  // EOF

        bool complete = true;
        for (size_t i = 0; i < n_tok_species; ++i)
            if (!rows[i].present) complete = false;
        if (!complete) {
            if (feof(mf->fp) && !in_block) return 0;
            continue;  // skip block (reference read_data.py:110)
        }

        int64_t len = (int64_t)rows[0].text.size();
        if (len > cap) return -2;
        const char* r0 = rows[0].text.c_str();
        const char* r1 = rows[1].text.c_str();
        const char* r2 = rows[2].text.c_str();
        const char* r3 = rows[3].text.c_str();
        for (int64_t i = 0; i < len; ++i) {
            tokens_out[i] =
                g_lut[g_base_code[(unsigned char)r0[i]]]
                     [g_base_code[(unsigned char)r1[i]]]
                     [g_base_code[(unsigned char)r2[i]]]
                     [g_base_code[(unsigned char)r3[i]]];
        }
        if (coords_out && mf->ref_index >= 0) {
            const SeqRow& rr = rows[mf->ref_index];
            if (!rr.present) {
                for (int64_t i = 0; i < len; ++i) coords_out[i] = -9;
            } else {
                int64_t pos = rr.strand == 1 ? rr.start
                                             : rr.src_size - rr.start;
                const char* rt = rr.text.c_str();
                for (int64_t i = 0; i < len; ++i) {
                    if (rt[i] == '-') {
                        coords_out[i] = -9;
                    } else {
                        coords_out[i] = pos;
                        pos += rr.strand;
                    }
                }
            }
        }
        return len;
    }
}

void maf_close(void* handle) {
    auto* mf = (MafFile*)handle;
    if (mf) {
        if (mf->fp) fclose(mf->fp);
        delete mf;
    }
}

}  // extern "C"
