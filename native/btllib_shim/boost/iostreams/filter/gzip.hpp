// boost::iostreams-compat shim: gzip_decompressor lives in
// filtering_streambuf.hpp (single-header implementation); this header only
// satisfies the reference's include of <boost/iostreams/filter/gzip.hpp>
// (ntedit.cpp:37).
#ifndef BOOST_IOSTREAMS_FILTER_GZIP_HPP
#define BOOST_IOSTREAMS_FILTER_GZIP_HPP

#include "../filtering_streambuf.hpp"

#endif
