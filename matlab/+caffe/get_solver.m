function solver = get_solver(solver_file)
% solver = caffe.get_solver(solver_file)
CHECK(ischar(solver_file) || isstring(solver_file), ...
      'solver_file must be a string');
h = caffe_('get_solver', char(solver_file));
solver = caffe.Solver(h);
end
