classdef Blob < handle
  % caffe.Blob — data/diff access on a bridge-side blob.  Arrays follow
  % the matcaffe layout contract: dimensions reversed from caffe's
  % (width fastest), single precision.

  properties (Access = private)
    h
  end

  methods
    function self = Blob(h)
      CHECK(is_valid_handle(h), 'invalid Blob handle');
      self.h = h;
    end

    function s = shape(self)
      s = caffe_('blob_get_shape', self.h);
      s = reshape(s, 1, []);
    end

    function reshape(self, new_shape)
      caffe_('blob_reshape', self.h, double(new_shape(:).'));
    end

    function d = get_data(self)
      d = caffe_('blob_get_data', self.h);
    end

    function set_data(self, d)
      caffe_('blob_set_data', self.h, single(d));
    end

    function d = get_diff(self)
      d = caffe_('blob_get_diff', self.h);
    end

    function set_diff(self, d)
      caffe_('blob_set_diff', self.h, single(d));
    end
  end
end
