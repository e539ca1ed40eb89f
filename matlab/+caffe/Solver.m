classdef Solver < handle
  % caffe.Solver — training driver over the bridge (all six solver
  % types; the prototxt's `type:` field picks the algorithm).

  properties (Access = private)
    h
  end
  properties (SetAccess = private)
    net
    test_nets
  end

  methods
    function self = Solver(varargin)
      if ~(nargin == 1 && isstruct(varargin{1}))
        self = caffe.get_solver(varargin{:});
        return
      end
      self.h = varargin{1};
      CHECK(is_valid_handle(self.h), 'invalid Solver handle');
      a = caffe_('solver_get_attr', self.h);
      self.net = caffe.Net(a.hNet_net);
      if isempty(a.hNet_test_nets)
        self.test_nets = caffe.Net.empty();
      else
        self.test_nets = arrayfun(@(hh) caffe.Net(hh), a.hNet_test_nets);
      end
    end

    function it = iter(self)
      it = caffe_('solver_get_iter', self.h);
    end

    function restore(self, snapshot_file)
      caffe_('solver_restore', self.h, snapshot_file);
    end

    function solve(self)
      caffe_('solver_solve', self.h);
    end

    function step(self, iters)
      caffe_('solver_step', self.h, double(iters));
    end
  end
end
