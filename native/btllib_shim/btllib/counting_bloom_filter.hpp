// btllib-compat shim: KmerCountingBloomFilter8 over the framework's .cbf
// format (ntedit_tpu/core/bloom.py KmerCountingBloomFilter8: one uint8
// counter per byte, count-min read = min over the hash_num probed slots,
// slot index = hash % bytes).  Surface used by /root/reference/ntedit.cpp
// BFWrapper (lines 357-395).
#ifndef BTLLIB_COUNTING_BLOOM_FILTER_HPP
#define BTLLIB_COUNTING_BLOOM_FILTER_HPP

#include "bloom_filter.hpp"

#include <cmath>
#include <cstdint>
#include <string>
#include <vector>

namespace btllib {

static const char* const KMER_COUNTING_BLOOM_FILTER_SIGNATURE =
    "[BTLKmerCountingBloomFilter_v6]";

class KmerCountingBloomFilter8
{
  public:
	explicit KmerCountingBloomFilter8(const std::string& path)
	{
		auto f = shim_internals::load_filter_file(path);
		if (f.signature != std::string(KMER_COUNTING_BLOOM_FILTER_SIGNATURE)) {
			std::cerr << "btllib shim: " << path << " is not a counting Bloom filter ("
			          << f.signature << ")" << std::endl;
			std::exit(EXIT_FAILURE);
		}
		counters_ = std::move(f.data);
		hash_num_ = shim_internals::meta_uint(f, "hash_num", 3);
		k_ = shim_internals::meta_uint(f, "k", 0);
	}

	uint8_t contains(const uint64_t* hashes) const
	{
		const uint64_t n = counters_.size();
		uint8_t c = 255;
		for (unsigned i = 0; i < hash_num_; ++i) {
			uint8_t v = counters_[hashes[i] % n];
			if (v < c)
				c = v;
		}
		return c;
	}

	unsigned get_k() const { return k_; }
	unsigned get_hash_num() const { return hash_num_; }
	uint64_t get_bytes() const { return counters_.size(); }

	double get_fpr() const
	{
		uint64_t occ = 0;
		for (uint8_t b : counters_)
			occ += (b != 0);
		return std::pow((double)occ / (double)counters_.size(), (double)hash_num_);
	}

  private:
	std::vector<uint8_t> counters_;
	unsigned hash_num_ = 3;
	unsigned k_ = 0;
};

} // namespace btllib

#endif
